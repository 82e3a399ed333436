package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Locally-generated sf1-equivalent testdata for the builder's own
  * beyond-the-gate sweeps (VERDICT r8 #7): the driver pins the oracle gate
  * at sf0.01 and the bench at sf0.1; this derives a 10× corpus from the
  * sf0.1 tables so Verify + the DuckDB compare (`tools/check_oracle.py`)
  * can be run once at sf1 scale, where cross-engine rounding boundaries
  * that are invisible at 60k rows (the r8 `bigram_surprisal` find,
  * `e2b21cf`) get 10× more chances to surface.
  *
  * Derivation, per replica r = 0..9 (r=0 is the identity copy):
  *  - every entity key is offset by r·10⁷ — uniform, far above any sf0.1
  *    key, and applied to foreign keys identically, so referential
  *    integrity (orders→customer, lineitem→orders/part/supplier) holds
  *    within each replica and joins scale 10× without cross-replica hits;
  *  - region/nation stay single copies (TPC-H semantics: fixed dims);
  *  - continuous measures (acctbal/price/value) get a deterministic
  *    ±10.00 hash jitter so aggregates see new distinct values, not ten
  *    copies of the same sum;
  *  - document text gets a per-replica prefix token (new shingles, new
  *    fingerprints — dedup pair structure stays realistic instead of
  *    every doc acquiring 9 exact clones);
  *  - embeddings rotate by r positions (norm-preserving, deterministic,
  *    fills new sign buckets / IVF cells).
  *
  * Everything is pure column arithmetic on driver data — no RNG, so the
  * output is bit-reproducible and the DuckDB oracle reads the same
  * parquet. Tables are written as single flat files named like the
  * driver's (`<out>/<table>.parquet`, TIMESTAMP_MICROS like the driver's)
  * so every existing tool (Verify, check_oracle, duck_bench) runs
  * unchanged against the output directory.
  *
  * Usage: `sbt "runMain graft.ScaleGen [srcDir] [outDir] [replicas]"`
  */
object ScaleGen {

  /** Key offset between replicas — above every sf0.1 key (max is
    * o_orderkey 149,999) with headroom for 100 replicas. */
  val Offset = 10000000L

  private def jitter2dp(c: String, keyCol: String, r: Int) =
    round(col(c) + (pmod(hash(col(keyCol), lit(r)), lit(2001)) - 1000) / 100.0, 2)

  /** One replica of `df` (r=0 = identity), with `keys` offset and
    * table-specific perturbations applied by the caller. */
  private def offsetKeys(df: DataFrame, r: Int, keys: Seq[String]): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * Offset)))

  def replicate(spark: SparkSession, srcDir: String, name: String,
      reps: Int): DataFrame = {
    val src = spark.read.parquet(s"$srcDir/$name.parquet")
    val replicas = (0 until reps).map { r =>
      val base = name match {
        case "region" | "nation" => if (r == 0) Some(src) else None
        case "customer" => Some {
          val d = offsetKeys(src, r, Seq("c_custkey"))
          if (r == 0) d else d.withColumn("c_acctbal", jitter2dp("c_acctbal", "c_custkey", r))
        }
        case "supplier" => Some {
          val d = offsetKeys(src, r, Seq("s_suppkey"))
          if (r == 0) d else d.withColumn("s_acctbal", jitter2dp("s_acctbal", "s_suppkey", r))
        }
        case "part" => Some {
          val d = offsetKeys(src, r, Seq("p_partkey"))
          if (r == 0) d else d.withColumn("p_retailprice", jitter2dp("p_retailprice", "p_partkey", r))
        }
        case "orders" => Some {
          val d = offsetKeys(src, r, Seq("o_orderkey", "o_custkey"))
          if (r == 0) d else d.withColumn("o_totalprice", jitter2dp("o_totalprice", "o_orderkey", r))
        }
        case "lineitem" => Some {
          val d = offsetKeys(src, r, Seq("l_orderkey", "l_partkey", "l_suppkey"))
          if (r == 0) d
          else d.withColumn("l_extendedprice", jitter2dp("l_extendedprice", "l_orderkey", r))
        }
        case "events" => Some {
          val d = offsetKeys(src, r, Seq("event_id", "user_id"))
          if (r == 0) d
          else d.withColumn("value",
            round(col("value") + (pmod(hash(col("event_id"), lit(r)), lit(1001)) - 500) / 1000.0, 3))
        }
        case "documents" => Some {
          val d = offsetKeys(src, r, Seq("doc_id"))
          if (r == 0) d
          else d
            .withColumn("text", concat(lit(s"r$r "), col("text")))
            // prefix length varies with the replica number ("r10 " is 4
            // chars) — add the actual literal length, not a constant
            .withColumn("n_chars",
              when(col("text").isNull, col("n_chars"))
                .otherwise(col("n_chars") + lit(s"r$r ".length.toLong)))
        }
        case "embeddings" => Some {
          val d = offsetKeys(src, r, Seq("vec_id"))
          if (r == 0) d
          else d.withColumn("embedding", expr(
            s"""CASE WHEN embedding IS NULL OR size(embedding) <= 1 THEN embedding
                ELSE transform(sequence(0, size(embedding) - 1),
                  i -> embedding[int((i + $r) % size(embedding))]) END"""))
        }
        case other => sys.error(s"unknown table $other")
      }
      base
    }
    replicas.flatten.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "target/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      // the driver writes TIMESTAMP(MICROS); match it so Tables.* and the
      // DuckDB views behave identically on generated data
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val tmpRoot = Files.createTempDirectory("graft-scalegen")
    Tables.names.foreach { name =>
      val df = replicate(spark, srcDir, name, reps)
      val tmp = s"$tmpRoot/$name"
      // single flat file named like the driver's tables, so check_oracle's
      // `FROM '<dir>/<t>.parquet'` and Tables.load both work unchanged —
      // but with SMALL ROW GROUPS (2 MB vs the 128 MB default): a real
      // warehouse table is thousands of files and Spark's split sizing
      // (`bytesPerCore` floored at `openCostInBytes`) happily carves a
      // single file into per-core ranges, yet a range only executes the
      // row groups whose start it contains — one giant row group
      // single-threads every scan of the table no matter the split conf.
      // Measured at sf10: the 50 MB embeddings table was ONE row group,
      // so every embedding kernel (decontaminate_semantic's 452 s
      // BestMatch pass above all) ran on one core of 32. 2 MB row groups
      // restore the many-files parallelism the corpus is standing in for.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 2L * 1024 * 1024)
        .parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part for $name"))
      Files.copy(part.toPath, Paths.get(outDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"[scalegen] $outDir/$name.parquet rows=${spark.read.parquet(s"$outDir/$name.parquet").count()}")
    }
    spark.stop()
  }
}
