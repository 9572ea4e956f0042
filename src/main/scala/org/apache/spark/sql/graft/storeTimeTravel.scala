/** SQL time travel over graft versioned stores.
  *
  * [[graft.operators.BucketedStores]] retains store generations as
  * immutable physical tables (`name__v<k>`) behind a serving view —
  * readable through `readGeneration`, but until now API-only. Every
  * lakehouse exposes the same capability as SQL text
  * (`VERSION AS OF` / `TIMESTAMP AS OF`: Delta, Iceberg, BigQuery),
  * and Spark 4's STOCK grammar already parses both clauses into a
  * [[org.apache.spark.sql.catalyst.analysis.RelationTimeTravel]] node
  * — it just has no resolution path for session-catalog (v1) tables.
  * This rule supplies one for graft versioned stores, following the
  * asofSqlSurface discipline: no grammar work at all this time, one
  * resolution rule, loud branded errors, and an untouched stand-down
  * path for anything that is not a graft store (DSv2 catalogs that
  * support native time travel keep working; everything else keeps
  * Spark's own error).
  *
  *   SELECT ... FROM store VERSION AS OF 3
  *     → the retained generation table `store__v3`; an AnalysisException
  *       listing the live generations if 3 was retired (maintenance ran
  *       with a smaller `retain` than the lookback).
  *   SELECT ... FROM store TIMESTAMP AS OF '2026-08-15 12:00:00'
  *     → the NEWEST generation whose catalog creation time is at or
  *       before the cutoff — i.e. the generation a reader resolving the
  *       serving view at that wall-clock instant would have seen.
  *
  * Merge-on-read stores version by SEQUENCE within a compaction era
  * (`readMorAsOfSeq`), not by generation — a raw generation read would
  * silently include tombstoned rows — so a MoR store name is rejected
  * with a pointer to the API rather than resolved wrong.
  *
  * Reference parity note: the reference pipeline
  * (CI-CMG/wod-ascii-to-parquet-spark) has no store tier or SQL
  * surface; semantics here follow the public lakehouse dialect.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

case class ResolveStoreTimeTravel(spark: SparkSession)
  extends Rule[LogicalPlan] {

  private def fail(msg: String): Nothing =
    throw new AnalysisException(s"[GRAFT_TIME_TRAVEL] $msg", None, None,
      None, None, Map.empty[String, String], Array.empty)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          if isVersionedStore(storeName(u.multipartIdentifier)) =>
        val name = storeName(u.multipartIdentifier)
        if (tombstonesExist(name))
          fail(s"$name is a merge-on-read store — its history is " +
            "sequence-within-era, not generations; read a past state " +
            "with BucketedStores.readMorAsOfSeq (a raw generation " +
            "would include tombstoned rows)")
        val gen = (ts, ver) match {
          case (None, Some(v)) => byVersion(name, v)
          case (Some(t), None) => byTimestamp(name, t)
          case _ => fail("exactly one of VERSION AS OF / TIMESTAMP " +
            "AS OF is expected") // grammar enforces this; belt+braces
        }
        UnresolvedRelation(Seq(gen))
    }

  /** graft stores are session-catalog single-part names; accept the
    * spark_catalog[.default] spellings of the same thing.
    */
  private def storeName(ident: Seq[String]): String = ident match {
    case Seq(n) => n
    case Seq("default", n) => n
    case Seq("spark_catalog", "default", n) => n
    case _ => "" // three-part non-default: never a graft store
  }

  private def liveGenerations(name: String): Seq[Int] = {
    val cat = spark.sessionState.catalog
    val p = name + "__v"
    cat.listTables("default", p + "*")
      .map(_.table)
      .filter(t => t.startsWith(p) && t.stripPrefix(p).forall(_.isDigit)
        && t.stripPrefix(p).nonEmpty)
      .map(_.stripPrefix(p).toInt).sorted
  }

  private def isVersionedStore(name: String): Boolean =
    name.nonEmpty && liveGenerations(name).nonEmpty

  private def tombstonesExist(name: String): Boolean =
    spark.sessionState.catalog
      .listTables("default", name + "__t*")
      .exists(_.table.matches(
        java.util.regex.Pattern.quote(name) + "__t\\d+"))

  private def byVersion(name: String, v: String): String = {
    val k = try v.trim.toInt catch {
      case _: NumberFormatException =>
        fail(s"VERSION AS OF $v on graft store $name — generations " +
          "are integers (live: " +
          liveGenerations(name).mkString(", ") + ")")
    }
    val t = s"${name}__v$k"
    if (!spark.catalog.tableExists(t))
      fail(s"generation $k of $name is not retained — it was retired " +
        "by maintenance with a smaller retention window (live " +
        s"generations: ${liveGenerations(name).mkString(", ")}; raise " +
        "`retain` on maintenance ops to keep a longer lookback)")
    t
  }

  /** Newest generation created at or before the cutoff: catalog
    * creation time is the instant the generation's swap made it
    * resolvable, so this is what a reader of the serving view saw at
    * `t`. Ties (same millisecond) break to the higher generation, the
    * one the view served after the swap.
    */
  private def byTimestamp(name: String, t: Expression): String = {
    if (!t.foldable)
      fail(s"TIMESTAMP AS OF on $name must be a constant expression")
    val micros = Cast(t, TimestampType,
      Some(spark.sessionState.conf.sessionLocalTimeZone)).eval() match {
      case l: java.lang.Long => l.longValue()
      case null => fail(s"TIMESTAMP AS OF on $name evaluated to NULL")
      case other => fail(s"TIMESTAMP AS OF on $name evaluated to " +
        s"unexpected ${other.getClass.getSimpleName}")
    }
    val cutoffMs = Math.floorDiv(micros, 1000L)
    val cat = spark.sessionState.catalog
    val atOrBefore = liveGenerations(name).filter { k =>
      cat.getTableMetadata(TableIdentifier(s"${name}__v$k"))
        .createTime <= cutoffMs
    }
    if (atOrBefore.isEmpty)
      fail(s"no generation of $name existed at or before " +
        s"${Literal(micros, TimestampType).toString} — oldest live " +
        s"generation is ${liveGenerations(name).headOption.getOrElse(0)}" +
        " (earlier history was retired; raise `retain` to keep it)")
    s"${name}__v${atOrBefore.max}"
  }
}
