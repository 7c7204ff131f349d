package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Twenty-sixth tranche — GATE FUZZING (fz01..fz12): SQLsmith-style
  * randomized differential testing (Seltenreich's SQLsmith; Rigger &
  * Su's SQLancer lineage) pointed at the one boundary every oracle
  * row already crosses — Spark vs DuckDB semantics. Twelve SEEDED
  * pseudo-random plans over a deliberately integer-exact algebra
  * (equi-join, conjunctive predicates, grouped exact aggregates,
  * HAVING) are generated from one AST per seed and rendered BOTH as
  * a Spark DataFrame plan and as DuckDB SQL — so the driver's hash
  * gate becomes a differential fuzzer: any divergence in join
  * semantics, predicate evaluation, date extraction, modulo, rounding,
  * or aggregate typing between the renderers (or the engines) breaks
  * a hash.
  *
  * Why this isn't more hand-written queries: the q01-q81 surface
  * tests plans a HUMAN thought to write; the fuzz rows test the
  * CROSS-PRODUCT of algebra features a human wouldn't enumerate
  * (e.g. seed-chosen "join + mod filter + year key + HAVING" shapes).
  * The generator is a pure function of the seed (java.util.Random's
  * LCG is specification-fixed), so every row is reproducible,
  * committed, and certified like any other query — randomized
  * GENERATION, deterministic ARTIFACT.
  *
  * The algebra is restricted to operations both engines define
  * identically on exact types (the repo's fixed-point discipline):
  * long counts/sums on the cents grid, min/max on longs and strings,
  * integer modulo on positive keys, year() on timestamps, string
  * equality. No doubles, no floats, no division, no nulls in any
  * touched column — divergence can only mean a real semantics bug.
  */
object Fuzz {

  private val N_QUERIES = 12

  // ---- the tiny AST ---------------------------------------------------

  private sealed trait Pred
  private case class QtyLe(k: Int) extends Pred            // l_quantity <= k
  private case class KeyMod(m: Int, r: Int) extends Pred   // l_orderkey % m = r
  private case class ShipGe(date: String) extends Pred     // l_shipdate >= date
  private case class FlagNe(v: String) extends Pred        // l_returnflag <> v
  private case class PrioEq(v: String) extends Pred        // o_orderpriority = v (join only)

  private case class Ast(
      join: Boolean,           // lineitem ⋈ orders on orderkey?
      keys: Seq[String],       // grouping keys (possibly empty = global)
      preds: Seq[Pred],        // conjunctive filters
      wantMin: Boolean,        // min(l_orderkey) measure
      wantMax: Boolean,        // max(grouping-safe string) measure
      havingN: Option[Int])    // HAVING n >= h

  private val L_KEYS = Seq("l_returnflag", "l_linestatus")
  private val O_KEYS = Seq("o_orderpriority", "o_year")
  private val PRIOS = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
  private val FLAGS = Seq("R", "A", "N")
  private val DATES = Seq("1994-01-01", "1996-06-15", "1992-03-01")

  /** Deterministic AST for a seed: java.util.Random's LCG is part of
    * the Java specification, so the artifact is stable across JVMs,
    * sessions, and rounds. */
  private def astFor(seed: Int): Ast = {
    val r = new java.util.Random(seed.toLong * 0x9E3779B9L + 17)
    val join = r.nextBoolean()
    val keyPool = if (join) L_KEYS ++ O_KEYS else L_KEYS
    val nKeys = r.nextInt(keyPool.size + 1)
    // stable key subset: shuffle indices via the seeded stream
    val keys = r.ints(0, keyPool.size).distinct().limit(nKeys.toLong)
      .toArray.toSeq.map(keyPool)
    val predPool = Seq[Int => Pred](
      _ => QtyLe(10 + r.nextInt(31)),
      _ => KeyMod(2 + r.nextInt(6), 0),
      _ => ShipGe(DATES(r.nextInt(DATES.size))),
      _ => FlagNe(FLAGS(r.nextInt(FLAGS.size)))) ++
      (if (join) Seq[Int => Pred](_ => PrioEq(PRIOS(r.nextInt(PRIOS.size))))
       else Nil)
    val nPreds = r.nextInt(3)
    val preds = r.ints(0, predPool.size).distinct().limit(nPreds.toLong)
      .toArray.toSeq.map(i => predPool(i)(0))
    Ast(join, keys, preds,
      wantMin = r.nextBoolean(), wantMax = r.nextBoolean(),
      havingN = if (keys.nonEmpty && r.nextInt(3) == 0)
        Some(1 + r.nextInt(5)) else None)
  }

  // ---- Spark renderer -------------------------------------------------

  private def cents: Column =
    round(col("l_extendedprice") * (lit(1) - col("l_discount")) * lit(100))
      .cast("long")

  private def sparkPred(p: Pred): Column = p match {
    case QtyLe(k)   => col("l_quantity") <= k
    case KeyMod(m, r) => col("l_orderkey") % m === r.toLong
    case ShipGe(d)  => col("l_shipdate") >= lit(d).cast("timestamp")
    case FlagNe(v)  => col("l_returnflag") =!= v
    case PrioEq(v)  => col("o_orderpriority") === v
  }

  private def sparkQuery(ast: Ast)(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val base0 =
      if (ast.join)
        l.join(Tables.load(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority"),
              year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
      else l
    val base = ast.preds.foldLeft(base0)((d, p) => d.filter(sparkPred(p)))
    val aggs = Seq(
      count(lit(1)).as("n"), sum(cents).as("sum_cents")) ++
      (if (ast.wantMin) Seq(min(col("l_orderkey")).as("mn")) else Nil) ++
      (if (ast.wantMax) Seq(max(col("l_linestatus")).as("mx")) else Nil)
    val grouped =
      if (ast.keys.isEmpty) base.agg(aggs.head, aggs.tail: _*)
      else base.groupBy(ast.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val cut = ast.havingN.fold(grouped)(h => grouped.filter(col("n") >= h))
    if (ast.keys.isEmpty) cut
    else cut.orderBy(ast.keys.map(col): _*)
  }

  // ---- DuckDB renderer ------------------------------------------------

  private def sqlPred(p: Pred): String = p match {
    case QtyLe(k)   => s"l_quantity <= $k"
    case KeyMod(m, r) => s"l_orderkey % $m = $r"
    case ShipGe(d)  => s"l_shipdate >= TIMESTAMP '$d'"
    case FlagNe(v)  => s"l_returnflag <> '$v'"
    case PrioEq(v)  => s"o_orderpriority = '$v'"
  }

  private def sqlQuery(ast: Ast): String = {
    val from =
      if (ast.join)
        """FROM lineitem JOIN (SELECT o_orderkey, o_orderpriority,
          |  CAST(year(o_orderdate) AS BIGINT) AS o_year FROM orders) o
          |  ON l_orderkey = o_orderkey""".stripMargin
      else "FROM lineitem"
    val where =
      if (ast.preds.isEmpty) ""
      else "\nWHERE " + ast.preds.map(sqlPred).mkString(" AND ")
    val meas = Seq(
      "CAST(count(*) AS BIGINT) AS n",
      "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) " +
        "AS BIGINT)) AS BIGINT) AS sum_cents") ++
      (if (ast.wantMin) Seq("min(l_orderkey) AS mn") else Nil) ++
      (if (ast.wantMax) Seq("max(l_linestatus) AS mx") else Nil)
    val sel = (ast.keys ++ meas).mkString(",\n  ")
    val group =
      if (ast.keys.isEmpty) ""
      else "\nGROUP BY " + ast.keys.mkString(", ")
    val having = ast.havingN.fold("")(h => s"\nHAVING count(*) >= $h")
    val order =
      if (ast.keys.isEmpty) ""
      else "\nORDER BY " + ast.keys.mkString(", ")
    s"SELECT $sel\n$from$where$group$having$order"
  }

  // ---- registration ---------------------------------------------------

  /** Human-auditable description of each generated plan (the spec
    * prints these; COVERAGE.md records the committed set). */
  private[graft] def describe(seed: Int): String = {
    val a = astFor(seed)
    s"seed=$seed join=${a.join} keys=${a.keys.mkString("[", ",", "]")} " +
      s"preds=${a.preds.mkString("[", ",", "]")} min=${a.wantMin} " +
      s"max=${a.wantMax} having=${a.havingN}"
  }

  private[graft] def sqlFor(seed: Int): String = sqlQuery(astFor(seed))

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    (1 to N_QUERIES).map { i =>
      f"fz$i%02d_differential" ->
        ((s: SparkSession, dir: String) => sparkQuery(astFor(i))(s, dir))
    }.toMap

  val oracles: Map[String, String] =
    (1 to N_QUERIES).map(i => f"fz$i%02d_differential" -> sqlFor(i)).toMap
}
