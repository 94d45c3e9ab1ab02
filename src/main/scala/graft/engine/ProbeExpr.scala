package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native Catalyst expressions for the executor-local membership probes.
  *
  * The probes run on EVERY candidate link of every round (the crawl's
  * hottest scalar path after the fetch itself): a Scala UDF there pays
  * per-row boxing plus both catalyst converter directions (`ScalaUDF`
  * codegen routes every argument and result through CatalystTypeConverters).
  * These expressions skip all of that — `doGenCode` emits a direct
  * monomorphic call on a referenced config object with PRIMITIVE
  * `(int, long)` arguments, so the generated stage reads columns and calls
  * the probe with zero allocation per row. `eval` covers interpreted mode.
  *
  * The probe logic itself (Bloom prefilter + sorted-run binary search over
  * executor-cached [[KeyLog]] runs) lives on the config case classes —
  * shared verbatim between eval and codegen.
  */
object ProbeExpr {

  /** Live-seen config: Bloom prefilter dir + exact key-run dirs + TTL
    * liveness pinned at round `round`.
    */
  case class SeenCfg(bloomDir: String, keyDirs: IndexedSeq[String],
      round: Int, ttl: Int) {
    def probe(b: Int, h: Long): Boolean = {
      val maybe = BloomCache.get(bloomDir, b) match {
        case Some(bf) => bf.mightContainLong(h)
        case None => true // missing filter must not veto the exact probe
      }
      maybe && keyDirs.exists { d =>
        KeyLogCache.get(d, b) match {
          case Some((hs, aux)) =>
            KeyLog.existsMatch(hs, aux, h)(sr => ttl <= 0 || round - sr < ttl)
          case None => false
        }
      }
    }
  }

  /** Live-frontier-membership config: some add run holds a version no
    * tombstone run has removed.
    */
  case class MemberCfg(addDirs: IndexedSeq[String], remDirs: IndexedSeq[String]) {
    def probe(b: Int, h: Long): Boolean = {
      def removed(s: Int): Boolean = remDirs.exists { d =>
        KeyLogCache.get(d, b) match {
          case Some((hs, aux)) => KeyLog.existsMatch(hs, aux, h)(_ == s)
          case None => false
        }
      }
      addDirs.exists { d =>
        KeyLogCache.get(d, b) match {
          case Some((hs, aux)) => KeyLog.existsMatch(hs, aux, h)(s => !removed(s))
          case None => false
        }
      }
    }
  }

  /** Exact (hash, addedSeq) tombstone-pair config. */
  case class RemovedCfg(remDirs: IndexedSeq[String]) {
    def probe(b: Int, h: Long, s: Int): Boolean = remDirs.exists { d =>
      KeyLogCache.get(d, b) match {
        case Some((hs, aux)) => KeyLog.existsMatch(hs, aux, h)(_ == s)
        case None => false
      }
    }
  }

  case class SeenLive(cfg: SeenCfg, left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "seen_live"
    override protected def nullSafeEval(b: Any, h: Any): Any =
      cfg.probe(b.asInstanceOf[Int], h.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("seenCfg", cfg,
        classOf[SeenCfg].getName)
      nullSafeCodeGen(ctx, ev, (b, h) => s"${ev.value} = $ref.probe($b, $h);")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SeenLive =
      copy(left = newLeft, right = newRight)
  }

  case class MemberLive(cfg: MemberCfg, left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "frontier_member_live"
    override protected def nullSafeEval(b: Any, h: Any): Any =
      cfg.probe(b.asInstanceOf[Int], h.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("memberCfg", cfg,
        classOf[MemberCfg].getName)
      nullSafeCodeGen(ctx, ev, (b, h) => s"${ev.value} = $ref.probe($b, $h);")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): MemberLive =
      copy(left = newLeft, right = newRight)
  }

  case class RemovedPair(cfg: RemovedCfg, first: Expression, second: Expression,
      third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "frontier_tombstoned"
    override protected def nullSafeEval(b: Any, h: Any, s: Any): Any =
      cfg.probe(b.asInstanceOf[Int], h.asInstanceOf[Long], s.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("removedCfg", cfg,
        classOf[RemovedCfg].getName)
      nullSafeCodeGen(ctx, ev,
        (b, h, s) => s"${ev.value} = $ref.probe($b, $h, $s);")
    }
    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): RemovedPair =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  def seenLive(cfg: SeenCfg)(bucket: Column, hash: Column): Column =
    bridge.toColumn(SeenLive(cfg,
      bridge.toExpression(bucket), bridge.toExpression(hash)))

  def memberLive(cfg: MemberCfg)(bucket: Column, hash: Column): Column =
    bridge.toColumn(MemberLive(cfg,
      bridge.toExpression(bucket), bridge.toExpression(hash)))

  def removedPair(cfg: RemovedCfg)(bucket: Column, hash: Column,
      seq: Column): Column =
    bridge.toColumn(RemovedPair(cfg, bridge.toExpression(bucket),
      bridge.toExpression(hash), bridge.toExpression(seq)))
}
