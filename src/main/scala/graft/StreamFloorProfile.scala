package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** Definitive profile of the stream-stream outer-join bench floor
  * (VERDICT r16 item 6): WHERE does the ~2 s per row go — micro-batch
  * planning, state-store commit, WAL/offset bookkeeping, or the sink —
  * and does either knob the deployment actually owns (state-store
  * partition count, RocksDB vs the default HDFS-backed provider) move it?
  *
  * Protocol: run the UNMODIFIED registry row fns (`SparkEntry.queries`)
  * with a `StreamingQueryListener` attached; every micro-batch reports its
  * `durationMs` breakdown (addBatch / getBatch / queryPlanning /
  * walCommit / commitOffsets / triggerExecution) plus the state operator's
  * commit time. Each (row, partitions, provider) cell is min-of-2 on wall
  * time with the batch breakdown taken from the faster run. Results land
  * as one JSON line consumed into BENCH_ISOLATION.json's notes.
  */
object StreamFloorProfile {

  private case class BatchProf(
      batchId: Long, durationMs: Map[String, Long], stateCommitMs: Long,
      stateRows: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(t => Tables(spark, sfDir, t).count())

    val batches = ArrayBuffer.empty[BatchProf]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.map { case (k, v) =>
          k -> Long2long(v) }.toMap
        val (commit, rows) = Option(p.stateOperators).filter(_.nonEmpty)
          .map(ops => (ops.map(_.commitTimeMs).sum,
            ops.map(_.numRowsTotal).sum))
          .getOrElse((0L, 0L))
        batches.synchronized {
          batches += BatchProf(p.batchId, dur, commit, rows) }
      }
    }
    spark.streams.addListener(listener)

    val rows = Seq(
      "stream_stream_left_outer", "stream_stream_right_outer",
      "stream_stream_full_outer", "stream_stream_join")
    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val partCounts = Seq(1, 2)

    def withConfs[T](kvs: (String, String)*)(body: => T): T = {
      val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally olds.foreach { case (k, o) =>
        o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }

    val cells = for {
      row <- rows
      (provName, provClass) <- providers
      parts <- partCounts
    } yield {
      def once(): (Double, Seq[BatchProf]) = {
        batches.synchronized(batches.clear())
        val t0 = System.nanoTime()
        withConfs(
          "spark.sql.streaming.stateStore.providerClass" -> provClass,
          "graft.stream.partitions" -> parts.toString) {
          SparkEntry.queries(row)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // grab a stable copy; listener events are async but AvailableNow +
        // awaitTermination inside the row fn means all batches landed.
        Thread.sleep(200)
        (sec, batches.synchronized(batches.toVector))
      }
      val (s1, b1) = once(); val (s2, b2) = once()
      val (sec, bs) = if (s1 <= s2) (s1, b1) else (s2, b2)
      val bjson = bs.sortBy(_.batchId).map { b =>
        val d = b.durationMs
        def g(k: String) = d.getOrElse(k, 0L)
        s"""{"batch":${b.batchId},"trigger":${g("triggerExecution")},""" +
          s""""addBatch":${g("addBatch")},"getBatch":${g("getBatch")},""" +
          s""""planning":${g("queryPlanning")},"walCommit":${g("walCommit")},""" +
          s""""commitOffsets":${g("commitOffsets")},""" +
          s""""stateCommit":${b.stateCommitMs},"stateRows":${b.stateRows}}"""
      }.mkString("[", ",", "]")
      s"""{"row":"$row","provider":"$provName","partitions":$parts,""" +
        f""""wall_sec":$sec%.3f,"batches":$bjson}"""
    }
    println(s"""{"metric":"stream_floor_profile","sf":"$sfDir",""" +
      s""""cells":${cells.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
