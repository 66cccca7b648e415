package graft.tools

import org.apache.spark.sql.functions._

/** Storage-partitioned-join stress: quantifies the q81 scale story —
  * what the exact one-file-per-key layout + KeyGroupedPartitioning
  * report buy on a co-partitioned fact-fact join — at growing size.
  *
  * Shape: the production "sharded entity" layout. Both facts carry
  * `shard = user % 200` as their `PARTITIONED BY` column (200 keys is
  * under the spjMaxKeys cap — the bucket count, not the entity
  * cardinality); the join is `ON a.shard = b.shard AND a.user = b.user`
  * (partition keys ⊆ join keys, the SPJ co-partition requirement), so
  * Spark co-schedules matching shard groups and the within-shard join
  * runs with NO exchange on either side.
  *
  * For each replication factor x (A = 2M·x rows, B = 1M·x rows):
  *   - `layout_sec`: the one-off partitioned INSERTs of both tables;
  *   - `shuffle_sec`: the join with `v2.bucketing` OFF — both sides
  *     exchange (what every repeated query pays without the layout);
  *   - `spj_sec`: the same query with the report consumed — zero
  *     exchanges (asserted on the plan, not assumed).
  * At 100 TB the shuffle side additionally pays network+spill that
  * local[32] cannot model, so the measured ratio is a LOWER bound.
  *
  * Usage: `sbt "runMain graft.tools.StressSpj [xFactors...]"`
  * (default `1 10`). One JSON line per x.
  */
object StressSpj {
  def main(args: Array[String]): Unit = {
    val xs = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)
    val spark = graft.GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-spjstress")
    spark.conf.set("spark.sql.catalog.spjs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjs.root", dir.resolve("lake").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjs.s")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    import StressUtil.{timed, drain}
    val out = for (x <- xs) yield {
      spark.sql(s"DROP TABLE IF EXISTS spjs.s.a$x")
      spark.sql(s"DROP TABLE IF EXISTS spjs.s.b$x")
      spark.sql(s"""CREATE TABLE spjs.s.a$x
        (shard INT, user BIGINT, v BIGINT) PARTITIONED BY (shard)""")
      spark.sql(s"""CREATE TABLE spjs.s.b$x
        (shard INT, user BIGINT, w BIGINT) PARTITIONED BY (shard)""")
      val tLayout = timed {
        spark.sql(s"""INSERT INTO spjs.s.a$x
          SELECT CAST(id % 200 AS INT), id, id * 3
          FROM range(0, ${2000000L * x})""")
        spark.sql(s"""INSERT INTO spjs.s.b$x
          SELECT CAST(id % 200 AS INT), id, id * 7
          FROM range(0, ${1000000L * x})""")
      }
      def query = spark.sql(s"""SELECT count(*) AS n, sum(a.v + b.w) AS s
        FROM spjs.s.a$x a JOIN spjs.s.b$x b
          ON a.shard = b.shard AND a.user = b.user""")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val tShuffle = timed(drain(query))
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // join keys (shard, user) are a SUPERSET of the partition key —
      // co-partitioning on shard alone is sufficient and sound; the
      // default requireAllClusterKeysForCoPartition=true declines it
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        "false")
      val q = query
      val plan = q.queryExecution.executedPlan.toString
      // the ungrouped final aggregate keeps its legitimate
      // SinglePartition exchange; the JOIN must not shuffle
      require(!plan.contains("Exchange hashpartitioning"),
        s"SPJ run must not shuffle the join:\n$plan")
      val tSpj = timed(drain(q))
      // ——— bucket-transform SPJ (round 9): same join, but the layout
      // is PARTITIONED BY (bucket(64, user)) — DIRECT co-partitioning
      // on the high-cardinality entity key itself (2M·x distinct
      // users, 4 orders of magnitude past spjMaxKeys), which the
      // identity layout can never express. 64 buckets per commit,
      // zero exchanges on either join side.
      spark.sql(s"DROP TABLE IF EXISTS spjs.s.ba$x")
      spark.sql(s"DROP TABLE IF EXISTS spjs.s.bb$x")
      spark.sql(s"""CREATE TABLE spjs.s.ba$x
        (user BIGINT, v BIGINT) PARTITIONED BY (bucket(64, user))""")
      spark.sql(s"""CREATE TABLE spjs.s.bb$x
        (user BIGINT, w BIGINT) PARTITIONED BY (bucket(64, user))""")
      val tBucketLayout = timed {
        spark.sql(s"""INSERT INTO spjs.s.ba$x
          SELECT id, id * 3 FROM range(0, ${2000000L * x})""")
        spark.sql(s"""INSERT INTO spjs.s.bb$x
          SELECT id, id * 7 FROM range(0, ${1000000L * x})""")
      }
      def bquery = spark.sql(s"""SELECT count(*) AS n, sum(a.v + b.w) AS s
        FROM spjs.s.ba$x a JOIN spjs.s.bb$x b ON a.user = b.user""")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val tBucketShuffle = timed(drain(bquery))
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val bq = bquery
      val bplan = bq.queryExecution.executedPlan.toString
      require(!bplan.contains("Exchange hashpartitioning"),
        s"bucket SPJ run must not shuffle the join:\n$bplan")
      val tBucketSpj = timed(drain(bq))
      f"""{"x":$x,"a_rows":${2000000L * x},"b_rows":${1000000L * x},"layout_sec":$tLayout%.2f,"shuffle_sec":$tShuffle%.2f,"spj_sec":$tSpj%.2f,"bucket_layout_sec":$tBucketLayout%.2f,"bucket_shuffle_sec":$tBucketShuffle%.2f,"bucket_spj_sec":$tBucketSpj%.2f}"""
    }
    out.foreach(println)
    spark.stop()
  }
}
