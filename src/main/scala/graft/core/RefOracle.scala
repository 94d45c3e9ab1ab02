package graft.core

import scala.collection.mutable

/** Single-threaded reference oracle for the crawl semantics — plain Scala
  * collections, no Spark. The Spark engine must reproduce this EXACTLY
  * (crawl order, URL-seen set, fetched payloads); scalatest asserts equality.
  *
  * The reference crawler's own within-page order is unspecified (Python set
  * iteration, medcrawler/pubmed.py:129), so the determinism contract is
  * pinned here (SURVEY.md §7.3) and implemented twice:
  *
  * == Pinned round semantics ==
  * Round r (starting at 0), with state {seen: Set[urlHash], frontier:
  * Map[urlHash → entry], totalScheduled}:
  *  1. eligible = frontier entries with notBeforeRound ≤ r.
  *  2. robots: eligible whose canonical path starts with a disallowed prefix
  *     of their host's policy are dropped permanently (→ seen).
  *     (Ref analog: server-side filtering; the prefix rules live in the
  *     broadcast HostPolicy dim.)
  *  3. per-host quota: within each host order by (priority DESC, urlHash ASC)
  *     and keep the first quotaPerRound(host). (Ref analog: batch caps 3/5,
  *     medcrawler/pubmed.py:299, clinical_trials.py:242.)
  *  4. global budget: order the quota survivors by (priority DESC, host ASC,
  *     urlHash ASC) — THE schedule order — and keep the first
  *     (maxResults − totalScheduled). (Ref analog: max_results counting after
  *     seen-exclusion, medcrawler/pubmed.py:188-190.)
  *  5. fetch each scheduled entry, with a typed failure taxonomy
  *     (ref exceptions.py:36-66):
  *      - RATE-LIMITED (429-analog): if the host is rate-limited this round
  *        (SynthCorpus.rateLimitDefer > 0) every fetch against it fails
  *        WITHOUT consuming an attempt; the URL re-enters the frontier with
  *        notBeforeRound = r + retryAfter, and after expansion the WHOLE
  *        host is deferred: every frontier entry of that host gets
  *        notBeforeRound = max(its value, r + retryAfter) (Retry-After
  *        analog, medcrawler/base.py:296-301).
  *      - PERMANENT (404-analog, failAttempts ≥ PermanentFail): dropped
  *        immediately (→ seen), no retry burn.
  *      - TRANSIENT (attempt < failAttempts < PermanentFail): with
  *        attempt+1 < maxRetries re-enters with attempt+1 and
  *        notBeforeRound = r + backoffRounds(attempt+1), backoffRounds(a) =
  *        min(2^a, 8) (echo of the reference wait_chain: fixed, then
  *        exponential, capped — medcrawler/base.py:136-154); otherwise
  *        exhausted (→ seen).
  *     Success iff not rate-limited and attempt ≥ failAttempts(url).
  *     Scheduled entries leave the frontier.
  *  6. seen ∪= {fetched ok} ∪ {permanently failed or retry-exhausted}
  *     ∪ {robots-blocked}.
  *  7. outlink expansion (successful fetches only): every raw outlink of a
  *     page contributes cash = parent.priority · gamma / numRawOutlinks to
  *     its canonical target, truncated to integer fixed point ([[Opic]]).
  *     Targets already in seen or pending in the frontier receive nothing
  *     (no accumulation to pending — ref analog: seen-exclusion during
  *     iteration). New targets accumulate total priority =
  *     Opic.toPriority(sum of per-LINK cashFp) — exact integer sum,
  *     order-independent. depth/path/seedId come from the parent of the
  *     link with (max per-link cashFp, then min parent urlHash). New
  *     entries have attempt 0, notBeforeRound = r+1.
  *  8. stop when frontier is empty, totalScheduled ≥ maxResults, or
  *     maxRounds reached.
  */
object RefOracle {

  case class OracleResult(
      order: Vector[(Int, String)], // (round, canonUrl) in schedule order
      seen: Set[Long],
      fetched: Vector[CrawledImage], // in schedule order of success
      lineage: Map[String, (String, Seq[String])], // canonUrl -> (seedId, path)
      metrics: Vector[RoundMetrics])

  def backoffRounds(attempt: Int): Int = math.min(1 << attempt, 8)

  private case class Pend(
      canonUrl: String,
      urlHash: Long,
      host: String,
      depth: Int,
      priority: Double,
      seedId: String,
      path: Vector[String],
      attempt: Int,
      notBeforeRound: Int)

  def crawl(spec: CorpusSpec, seeds: Seq[Seed], cfg: CrawlConfig): OracleResult = {
    val policies: Map[String, HostPolicy] =
      spec.hostPolicies.map(p => p.host -> p).toMap
    def policy(host: String): HostPolicy =
      policies.getOrElse(host, HostPolicy(host, 340, 3, Seq("/private")))

    // seen: urlHash -> round that stamped it. With ttlRounds > 0 an entry
    // only excludes while round - stamp < ttl (TTL refetch, ref
    // medcrawler/base.py:52-93,161-216); ttl = 0 ⇒ seen-forever.
    val seen = mutable.Map.empty[Long, Int]
    def isSeen(h: Long, round: Int): Boolean = seen.get(h).exists(sr =>
      cfg.ttlRounds <= 0 || round - sr < cfg.ttlRounds)
    val frontier = mutable.Map.empty[Long, Pend]
    // seed dedup: keep max (priority, seedId) per canonical hash
    seeds.foreach { s =>
      val canon = Canon.canonicalize(s.url)
      val h = Canon.xxhash64(canon)
      val p = Pend(canon, h, Canon.hostOf(canon), 0, s.priority, s.seedId,
        Vector.empty, 0, 0)
      frontier.get(h) match {
        case Some(old)
            if old.priority > p.priority ||
              (old.priority == p.priority && old.seedId <= p.seedId) =>
          ()
        case _ => frontier(h) = p
      }
    }

    val order = Vector.newBuilder[(Int, String)]
    val fetched = Vector.newBuilder[CrawledImage]
    val lineage = mutable.Map.empty[String, (String, Seq[String])]
    val metrics = Vector.newBuilder[RoundMetrics]
    var totalScheduled = 0L
    var round = 0
    var done = false

    while (!done && round < cfg.maxRounds && frontier.nonEmpty) {
      val eligible = frontier.values.filter(_.notBeforeRound <= round).toVector
      val byHostCand = eligible.groupBy(_.host).view.mapValues(_.size.toLong).toMap

      // robots
      val (blocked, allowed) = eligible.partition { p =>
        policy(p.host).robotsDisallow.exists(pre => Canon.pathOf(p.canonUrl).startsWith(pre))
      }
      blocked.foreach { p => frontier.remove(p.urlHash); seen(p.urlHash) = round }

      // per-host quota
      val quotaKept = allowed
        .groupBy(_.host)
        .toVector
        .flatMap { case (host, es) =>
          es.sortBy(e => (-e.priority, e.urlHash)).take(policy(host).quotaPerRound)
        }

      // global budget + schedule order
      val remaining = (cfg.maxResults - totalScheduled).max(0L)
      val ordered = quotaKept.sortBy(e => (-e.priority, e.host, e.urlHash))
      val schedule = ordered.take(remaining.min(Int.MaxValue).toInt)
      totalScheduled += schedule.size

      schedule.foreach(e => order += ((round, e.canonUrl)))
      schedule.foreach(e => frontier.remove(e.urlHash))

      // fetch, with the typed failure taxonomy (rate-limit checked first:
      // a limited server rejects before the URL's own status is observable)
      val results = schedule.map { e =>
        val rl = SynthCorpus.rateLimitDefer(spec, e.host, round)
        if (rl > 0) (e, None, "ratelimited", rl)
        else SynthCorpus.fetch(spec, e.canonUrl, e.attempt) match {
          case Some(img) => (e, Some(img), "", 0)
          case None =>
            val kind =
              if (SynthCorpus.failAttempts(spec, e.canonUrl) >= SynthCorpus.PermanentFail)
                "permanent"
              else "transient"
            (e, None, kind, 0)
        }
      }
      val okResults = results.collect { case (e, Some(img), _, _) => (e, img) }
      val failResults = results.collect { case (e, None, kind, _) => e -> kind }

      okResults.foreach { case (e, img) =>
        seen(e.urlHash) = round
        fetched += img
        lineage(e.canonUrl) = (e.seedId, e.path)
      }
      results.foreach {
        case (e, None, "permanent", _) => seen(e.urlHash) = round
        case (e, None, "transient", _) =>
          if (e.attempt + 1 >= cfg.maxRetries) seen(e.urlHash) = round
          else {
            val a = e.attempt + 1
            frontier(e.urlHash) = e.copy(attempt = a, notBeforeRound = round + backoffRounds(a))
          }
        case (e, None, "ratelimited", rl) =>
          // no attempt burn; deferred by the Retry-After analog
          frontier(e.urlHash) = e.copy(notBeforeRound = round + rl)
        case _ => ()
      }

      // outlink expansion: per child accumulate total fixed-point cash over
      // ALL links plus the representative parent = (max per-link cash, tie
      // → min parent urlHash) — the same single-level fold the engine's
      // one-shuffle groupBy computes
      // key: childHash -> (totalFp, bestCashFp, bestParent, childCanon)
      val contrib = mutable.Map.empty[Long, (Long, Long, Pend, String)]
      okResults.foreach { case (e, _) =>
        val raw = SynthCorpus.outlinks(spec, e.canonUrl)
        if (raw.nonEmpty) {
          val cashFp = Opic.toFp(e.priority * cfg.gamma / raw.size)
          raw.foreach { link =>
            val canon = Canon.canonicalize(link)
            val h = Canon.xxhash64(canon)
            if (!isSeen(h, round) && !frontier.contains(h)) {
              contrib.get(h) match {
                case None => contrib(h) = (cashFp, cashFp, e, canon)
                case Some((tot, bc, bp, _)) =>
                  val better = cashFp > bc ||
                    (cashFp == bc && e.urlHash < bp.urlHash)
                  contrib(h) =
                    if (better) (tot + cashFp, cashFp, e, canon)
                    else (tot + cashFp, bc, bp, canon)
              }
            }
          }
        }
      }
      contrib.foreach { case (h, (total, _, bp, canon)) =>
        frontier(h) = Pend(canon, h, Canon.hostOf(canon), bp.depth + 1,
          Opic.toPriority(total), bp.seedId, bp.path :+ bp.canonUrl, 0, round + 1)
      }

      // 429-analog WHOLE-HOST deferral (after expansion, so new entries of a
      // limited host are deferred too — mirrors the engine's frontier join)
      results.foreach {
        case (e, None, "ratelimited", rl) =>
          frontier.mapValuesInPlace { (_, p) =>
            if (p.host == e.host && p.notBeforeRound < round + rl)
              p.copy(notBeforeRound = round + rl)
            else p
          }
        case _ => ()
      }

      // metrics per (round, host)
      val hosts = (byHostCand.keySet ++ schedule.map(_.host)).toVector.sorted
      hosts.foreach { host =>
        val cand = byHostCand.getOrElse(host, 0L)
        val blk = blocked.count(_.host == host).toLong
        val sch = schedule.count(_.host == host).toLong
        val ok = okResults.count(_._1.host == host).toLong
        val fl = failResults.count(_._1.host == host).toLong
        val defr = cand - blk - sch
        metrics += RoundMetrics(round, host, cand, 0L, blk, sch, ok, fl, defr,
          defr * policy(host).minIntervalMs)
      }

      done = totalScheduled >= cfg.maxResults
      round += 1
    }

    OracleResult(order.result(), seen.keySet.toSet, fetched.result(), lineage.toMap,
      metrics.result())
  }
}
