package graft

import graft.ops.Sources
import graft.functions.ArrayMean
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Reference I/O fidelity (FIXTURES.md §A1/§A3): CSV scan with
  * inference → global sort → CSV sink round-trip, and the typed
  * ArrayMean Aggregator against the hand-computed gradient fixture. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv sort: schema inferred, total order, header round-trip") {
    val in = getClass.getResource("/export_tiny.csv").getPath
    val out = Files.createTempDirectory("csvsort").toString + "/out"
    Sources.csvSort(spark, in, out)
    val back = Sources.readCsv(spark, out)
    assert(back.columns.toSeq == Seq("cca2", "timestamp", "value"))
    // timestamp column must have been *inferred* as timestamp
    assert(Sources.readCsv(spark, in).schema("timestamp").dataType.typeName == "timestamp")
    val rows = back.collect().map(r => (r.getString(0), r.get(1).toString))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq, "cca2 not sorted")
    // ties on cca2 are broken by timestamp (reference task.py:24)
    rows.toSeq.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2) == g.map(_._2).sorted, s"timestamp not sorted within group: $g")
    }
    assert(back.count() == 6) // duplicate rows survive (sort, not dedup)
  }

  test("hive-style partitioned write prunes partitions on read") {
    val out = Files.createTempDirectory("part").toString + "/docs"
    Tables.documents(spark, sf0001)
      .write.partitionBy("lang").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    // pruned read returns exactly the en rows
    val expected = Tables.documents(spark, sf0001)
      .filter(col("lang") === "en").count()
    assert(en.count() == expected)
    // partition column survives the round-trip
    assert(back.columns.contains("lang"))
  }

  test("mergeSchema unions evolved parquet schemas") {
    val dir = Files.createTempDirectory("evolve").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq((2L, 3.5)).toDF("id", "v2").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "p"))
    assert(merged.count() == 2)
    assert(merged.filter(col("v2").isNotNull).count() == 1)
  }

  test("compression codecs round-trip (zstd, snappy)") {
    for (codec <- Seq("zstd", "snappy")) {
      val out = Files.createTempDirectory(s"codec$codec").toString + "/t"
      Tables.region(spark, sf0001).write
        .option("compression", codec).mode("overwrite").parquet(out)
      // the codec must actually be applied, not silently defaulted
      val files = new java.io.File(out).listFiles().map(_.getName)
      assert(files.exists(_.endsWith(s".$codec.parquet")), files.mkString(","))
      assert(spark.read.parquet(out).count() == 5)
    }
  }

  test("orc round-trip preserves schema and values") {
    val out = Files.createTempDirectory("orc").toString + "/li"
    val src = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.agg(sum(col("l_quantity"))).collect().head.getDouble(0) ==
      src.agg(sum(col("l_quantity"))).collect().head.getDouble(0))
  }

  test("jsonl round-trips with explicit schema; corrupt lines become nulls, not failures") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toFile
    try {
      val out = s"${dir.getAbsolutePath}/docs"
      val src = Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("source"), col("n_chars")).limit(50)
      ops.Sources.writeJsonl(src, out)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, source STRING, n_chars BIGINT")
      val back = ops.Sources.readJsonl(spark, out, schema)
      assert(back.schema == schema, "explicit schema must be taken verbatim, not inferred")
      val a = src.orderBy("doc_id").collect().map(_.toSeq).toSeq
      val b = back.orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(a == b, "jsonl round trip changed values")
      // PERMISSIVE default: a malformed line yields a null row, the
      // 100 TB-friendly contract (one bad record must not kill a job)
      val badFile = new java.io.File(dir, "bad/part-00000.json")
      badFile.getParentFile.mkdirs()
      java.nio.file.Files.writeString(badFile.toPath,
        """{"doc_id": 1, "source": "web", "n_chars": 10}
          |this is not json
          |""".stripMargin)
      val mixed = ops.Sources.readJsonl(spark, badFile.getParent, schema)
      assert(mixed.count() == 2 && mixed.filter(col("doc_id").isNull).count() == 1)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("ArrayMean aggregator matches the hand-computed gradient mean") {
    val grads = spark.read.json(getClass.getResource("/grads_tiny.json").getPath)
      .select(col("worker_id"), col("param_id"), col("grad").cast("array<double>").as("grad"))
      .as[(Long, Long, Array[Double])]
    val got = grads.groupByKey(_._2)
      .mapValues(_._3).agg(ArrayMean.toColumn)
      .collect().toMap
    assert(got(0L).toSeq == Seq(4.0, 5.0))   // mean of [1,3,5,7],[2,4,6,8]
    assert(got(1L).toSeq == Seq(1.0, 1.5))   // mean of [0.5,1.5],[0.5,2.5]
  }

  test("ArrayMean agrees with the posexplode all-reduce rendering") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])]
    val typed = e.groupByKey(_ => 0)
      .mapValues(_._2).agg(ArrayMean.toColumn)
      .collect().head._2
    val exploded = Tables.embeddings(spark, sf0001)
      .select(posexplode(transform(col("embedding"), x => x.cast("double"))))
      .toDF("pos", "g").groupBy("pos").agg(avg("g").as("m"))
      .orderBy("pos").collect().map(_.getDouble(1))
    typed.zip(exploded).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"$a vs $b")
    }
  }
}
