package graft.functions

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Persisted GeoIP/AS database — the Spark analog of the reference's
  * compiled-DB ops loop (xemkgeodb.c builds an artifact offline, the
  * collector mmaps it; geoip.c:91-183). [[compile]] turns the public
  * CSV dumps into sorted disjoint ranges stored as parquet on shared
  * storage ONCE; every job then [[read]]s the artifact — no per-job
  * CSV re-parse — and ships the broadcast-sized [[GeoDb]] to
  * executors. The parquet form is also directly queryable: a batch
  * enrichment can range-join `ip >= start AND ip <= end` against the
  * `lists` rows without loading a GeoDb at all (SURVEY §2.6's
  * range-join alternative).
  *
  * Addresses are stored as 16-byte big-endian binaries (v4 values
  * zero-extended) so one schema carries both families; the `family`
  * partition column (geo4 | as4 | geo6 | as6) keeps each table's rows
  * in their own parquet partition.
  */
object GeoDbStore {

  val schema: StructType = StructType(Seq(
    StructField("start", BinaryType, nullable = false),
    StructField("end", BinaryType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("family", StringType, nullable = false)))

  private[graft] def toBytes(x: BigInt): Array[Byte] = {
    val raw = x.toByteArray.dropWhile(_ == 0) // strip sign/leading zeros
    require(raw.length <= 16, s"address wider than 128 bits: $x")
    val out = new Array[Byte](16)
    System.arraycopy(raw, 0, out, 16 - raw.length, raw.length)
    out
  }
  private[graft] def toBig(b: Array[Byte]): BigInt = BigInt(1, b)

  private def rows(family: String, t: Lpm.Table): Seq[Row] =
    t.starts.indices.map { i =>
      Row(toBytes(t.starts(i)), toBytes(t.ends(i)), t.values(i), family)
    }

  /** Write a built [[GeoDb]] as the parquet artifact. */
  def write(spark: SparkSession, db: GeoDb, dir: String): Unit = {
    val all = rows("geo4", db.geo4) ++ rows("as4", db.as4) ++
      rows("geo6", db.geo6) ++ rows("as6", db.as6)
    spark.createDataFrame(
        java.util.Arrays.asList(all: _*), schema)
      .write.mode("overwrite").partitionBy("family").parquet(dir)
  }

  /** Load the artifact back into a broadcast-ready [[GeoDb]]. The
    * collect is bounded by the DB size — geo databases are
    * driver-sized by contract (the reference mmaps the whole artifact
    * per worker; a broadcast table is the same trade). Rows are
    * re-sorted on load, so the artifact does not depend on parquet
    * preserving write order. */
  def read(spark: SparkSession, dir: String): GeoDb = {
    val byFam = spark.read.parquet(dir)
      .select("family", "start", "end", "value")
      .collect()
      .groupBy(_.getString(0))
    def table(f: String): Lpm.Table = {
      val rs = byFam.getOrElse(f, Array.empty[Row])
        .map(r => (toBig(r.getAs[Array[Byte]](1)),
          toBig(r.getAs[Array[Byte]](2)), r.getString(3)))
        .sortBy(_._1)
      Lpm.Table(rs.map(_._1), rs.map(_._2), rs.map(_._3))
    }
    GeoDb(table("geo4"), table("as4"), table("geo6"), table("as6"))
  }

  /** The xemkgeodb-parity compile job: CSV dumps in, parquet artifact
    * out (geo + AS side by side, like the reference's geodb dir,
    * CONFIG.md:104-106). */
  def compile(spark: SparkSession, geoCsvPath: String, asCsvPath: String,
              outDir: String): Unit =
    write(spark, GeoLoader.fromFiles(geoCsvPath, asCsvPath), outDir)

  /** One `xegeoq`-style lookup line per family (xegeoq.c:155-188:
    * "<addr> geo: a, b, ..." / "<addr> as: n, desc"; '?' unknown). */
  private[graft] def queryLines(db: GeoDb, addr: String): Seq[String] = {
    val isV6 = addr.contains(":")
    val x =
      if (isV6) GeoLoader.ipv6ToBig(addr) else GeoLoader.ipv4ToBig(addr)
    val geo = (if (isV6) db.geo6 else db.geo4).lookup(x)
      .map(_.split("\\|", -1).mkString(", ")).getOrElse("?")
    val as = (if (isV6) db.as6 else db.as4).lookup(x)
      .map(_.split("\\|", -1).mkString(", ")).getOrElse("?")
    Seq(s"$addr geo: $geo", s"$addr as: $as")
  }

  /** CLI: the reference's two geo-DB tools in one main.
    *  - compile (xemkgeodb shape): `GeoDbStore <geo.csv> <as.csv> <out>`
    *  - lookup  (xegeoq shape):    `GeoDbStore query <dbDir> <ip>...` */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.ui.enabled", "false").getOrCreate()
    try args.toSeq match {
      case Seq("query", dbDir, addrs @ _*) if addrs.nonEmpty =>
        val db = read(spark, dbDir)
        addrs.foreach(a => queryLines(db, a).foreach(println))
      case Seq(geoCsv, asCsv, outDir) =>
        compile(spark, geoCsv, asCsv, outDir)
      case _ => sys.error(
        "usage: GeoDbStore <geo.csv> <as.csv> <outDir> | " +
          "GeoDbStore query <dbDir> <ip>...")
    } finally spark.stop()
  }

  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  /** Distributed v4 range-join enrichment — the scale path for when an
    * enrichment table OUTGROWS broadcast (the broadcast [[GeoDb]] is
    * the right tool for the reference-sized geo/AS DBs; a 100 TB-corpus
    * IP-reputation or flow-annotation table is not driver-sized).
    *
    * A naive `ip BETWEEN start AND end` join is a BroadcastNestedLoop /
    * cartesian — O(rows × ranges). Instead both sides are keyed by the
    * IP's top `prefixBits` bits: each range EXPLODES into the buckets
    * it overlaps (bounded by its width / 2^(32-prefixBits)), the flow
    * side computes one shift per row, and the join is a plain shuffled
    * EQUI-join on the bucket with the range test as residual. Ranges
    * are sorted-disjoint by construction ([[GeoLoader]]), so at most
    * one range matches any address — no post-join dedup needed.
    *
    * Returns `flows` + `valueAs` (null where no range covers the ip).
    * Skew note: a bucket is one /prefixBits block; pick prefixBits so
    * the hottest block's flow share fits an executor (8 → /8 blocks;
    * AQE skew-join splits residual hot buckets). */
  def rangeJoinV4(flows: DataFrame, ipCol: String, artifact: DataFrame,
                  family: String, valueAs: String,
                  prefixBits: Int = 8): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 24, s"prefixBits $prefixBits")
    val shift = 32 - prefixBits
    // v4 addresses sit in the last 4 of the 16 artifact bytes
    def v4(c: Column): Column =
      conv(substring(hex(c), 25, 8), 16, 10).cast("long")
    val ranges = artifact
      .filter(col("family") === family)
      .select(v4(col("start")).as("_rj_start"),
        v4(col("end")).as("_rj_end"), col("value").as(valueAs))
      .select(col("_rj_start"), col("_rj_end"), col(valueAs),
        explode(sequence(shiftright(col("_rj_start"), shift),
          shiftright(col("_rj_end"), shift))).as("_rj_bucket"))
    val f = flows
      .withColumn("_rj_bucket", shiftright(col(ipCol), shift)).alias("_f")
    val r = ranges.alias("_r")
    f.join(r,
        col("_f._rj_bucket") === col("_r._rj_bucket") &&
          col(s"_f.$ipCol") >= col("_r._rj_start") &&
          col(s"_f.$ipCol") <= col("_r._rj_end"),
        "left")
      .drop("_rj_bucket", "_rj_start", "_rj_end")
  }

  /** v6 form of [[rangeJoinV4]] over a binary(16) address column. The
    * bucket is the address's top `prefixBits` bits (hex-aligned so it
    * extracts as a substring of `hex()`; 32 → one bucket per /32
    * allocation). Residual range tests compare the binary columns
    * directly — Spark's BinaryType ordering is unsigned lexicographic,
    * which at fixed 16-byte width IS numeric order. A range wider than
    * a bucket explodes into every bucket it overlaps, so keep
    * prefixBits ≤ the narrowest expected allocation. */
  def rangeJoin6(flows: DataFrame, ipCol: String, artifact: DataFrame,
                 family: String, valueAs: String,
                 prefixBits: Int = 32): DataFrame = {
    require(prefixBits >= 4 && prefixBits <= 60 && prefixBits % 4 == 0,
      s"prefixBits must be a multiple of 4 in [4,60], got $prefixBits")
    val h = prefixBits / 4
    def bucket(c: Column): Column =
      conv(substring(hex(c), 1, h), 16, 10).cast("long")
    val ranges = artifact
      .filter(col("family") === family)
      .select(col("start").as("_rj_start"), col("end").as("_rj_end"),
        col("value").as(valueAs))
      .select(col("_rj_start"), col("_rj_end"), col(valueAs),
        explode(sequence(bucket(col("_rj_start")),
          bucket(col("_rj_end")))).as("_rj_bucket"))
    val f = flows
      .withColumn("_rj_bucket", bucket(col(ipCol))).alias("_f")
    val r = ranges.alias("_r")
    f.join(r,
        col("_f._rj_bucket") === col("_r._rj_bucket") &&
          col(s"_f.$ipCol") >= col("_r._rj_start") &&
          col(s"_f.$ipCol") <= col("_r._rj_end"),
        "left")
      .drop("_rj_bucket", "_rj_start", "_rj_end")
  }
}
