package graft.operators

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the [[Lineage]] contract in BOTH modes: the default
  * localCheckpoint cut and the reliable-store cut
  * (`spark.graft.lineage.reliable=true` + a checkpoint dir) must each
  * re-root to a constant-size leaf plan, and release must drop the
  * backing materialization (blocks resp. checkpoint files).
  */
class LineageSpec extends SparkSpec {

  private def withReliable[A](f: => A): A = {
    spark.conf.set(Lineage.ReliableConf, "true")
    try f finally spark.conf.unset(Lineage.ReliableConf)
  }

  test("reliable mode without a checkpoint dir fails fast with guidance") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "another test already set a checkpoint dir in this shared session")
    withReliable {
      val e = intercept[IllegalArgumentException] {
        Lineage.cut(spark.range(3).toDF("id"))
      }
      assert(e.getMessage.contains("setCheckpointDir"), e.getMessage)
    }
  }

  test("reliable cut re-roots to a leaf plan, preserves values, and " +
      "release deletes the checkpoint files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
      .toString
    spark.sparkContext.setCheckpointDir(dir)
    withReliable {
      val df = spark.range(100).toDF("id")
        .withColumn("v", col("id") * 3)
      val cut = Lineage.cut(df)
      // leaf re-rooting: the analyzed plan is a LogicalRDD, not the
      // project chain — the property the iterative operators rely on
      val leaf = cut.queryExecution.analyzed match {
        case r: LogicalRDD => r
        case other => fail(s"expected LogicalRDD leaf, got $other")
      }
      assert(leaf.children.isEmpty)
      // the materialization is FILES in the reliable store
      val ckptFile = leaf.rdd.getCheckpointFile
      assert(ckptFile.isDefined, "reliable cut must have a checkpoint file")
      val p = new org.apache.hadoop.fs.Path(ckptFile.get)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(p))
      assert(cut.agg(sum(col("v"))).collect()(0).getLong(0) == 3L * 99 * 50)
      Lineage.release(cut)
      assert(!fs.exists(p), "release must delete the k-1 generation's files")
    }
  }

  test("an iterative loop under reliable cuts computes the same result " +
      "as under local cuts, and drain() deletes the terminal generation") {
    import spark.implicits._
    // own checkpoint dir (idempotent — must not depend on suite order)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-loop")
      .toString
    spark.sparkContext.setCheckpointDir(dir)
    // small fixed-point PageRank: the operator's own loop exercises
    // cut+release generation rotation in both modes
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val local = PageRank.run(edges, nodes, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    CacheRegistry.drain()
    val reliable = withReliable {
      PageRank.run(edges, nodes, iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(local.sameElements(reliable))
    // the loop's TERMINAL generation outlives the operator (it is the
    // result); drain() must delete its files too — before the registry
    // tracked reliable cuts, every invocation leaked one generation here
    def rddDirs(): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(
          p => p.getFileName.toString.startsWith("rdd-")).toList
      } finally s.close()
    }
    assert(rddDirs().nonEmpty,
      "terminal reliable generation should exist before drain")
    CacheRegistry.drain()
    assert(rddDirs().isEmpty,
      s"drain must delete the terminal generation's checkpoint files")
  }
}
