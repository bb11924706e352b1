package graft

/** Sequential JVM twin for the round-20 breadth row
  * `text_html_boilerplate_strip`: the distributed regexp/fold chain must
  * equal a plain single-threaded replay of the identical strip pipeline
  * (java.util.regex + String ops + MessageDigest md5) over the collected
  * corpus — same discipline as the Round19 PSI replay.
  */
class Round20OpsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def trimOf(s: String, chars: Set[Char]): String = {
    var i = 0; var j = s.length
    while (i < j && chars(s.charAt(i))) i += 1
    while (j > i && chars(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  test("text_html_boilerplate_strip equals a sequential JVM replay") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)

    def page(id: Long, text: String, source: String): String =
      s"<html><head><title>Doc $id</title><style>body{margin:0}</style>" +
        s"<script>var t=$id;track(t);</script></head><body>" +
        "<nav><ul><li>Home</li><li>Docs</li><li>About</li></ul></nav>" +
        s"""<div id="main"><p>$text</p></div>""" +
        s"""<footer>&copy; 2026 $source &middot; """ +
        """<a href="/privacy">Privacy</a></footer></body></html>"""

    def strip(h: String): String = trimOf(
      h.replaceAll("<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", "")
        .replaceAll("</(title|li|ul|nav|p|div|footer)>", "\n")
        .replaceAll("<[^>]*>", " ")
        .replace("&copy;", "(c)").replace("&middot;", "-")
        .replaceAll(" +", " ")
        .replaceAll(" *\n *", "\n")
        .replaceAll("\n+", "\n"),
      Set(' ', '\n'))

    val expected = docs.map { case (id, text, source) =>
      val html = page(id, text, source)
      val clean = strip(html)
      val nTags = "<[^>]*>".r.findAllIn(html).size.toLong
      val (content, boiler) = clean.split("\n", -1)
        .partition(_.length >= 30)
      val cc = content.map(_.length.toLong).sum
      val bc = boiler.map(_.length.toLong).sum
      val keep = cc * 100 >= 85 * (cc + bc)
      (id, nTags, cc, bc, keep, md5hex(clean))
    }.toSeq

    val got = Registry.byId("text_html_boilerplate_strip").run(spark, sf)
      .select("doc_id", "n_tags", "content_chars", "boiler_chars",
        "keep", "clean_md5")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getString(5)))
      .toSeq

    assert(got.size == docs.length)
    assert(got == expected)
    // The gate must split the corpus — a constant flag would be vacuous.
    assert(expected.exists(_._5) && expected.exists(!_._5))
  }

  /** The streaming view-maintenance twin must serve EXACTLY the batch
    * row's view (same merge arithmetic, different arrival protocol) and
    * must genuinely run the two-micro-batch path — one per spool file —
    * so the partial-merge leg (not just the initial load) is exercised.
    */
  test("stream_incremental_agg_maintain equals its batch sibling") {
    val got = Registry.byId("stream_incremental_agg_maintain")
      .run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val want = Registry.byId("sink_incremental_agg_maintain")
      .run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }

  /** The audio row's in-plan PCM16LE encode must be GENUINE little-endian
    * 16-bit PCM, not merely self-consistent with its in-plan decoder:
    * decode the row's own binary column with java.nio.ByteBuffer
    * (LITTLE_ENDIAN asShortBuffer — the JVM's canonical PCM16LE reader)
    * and require the samples to equal the closed-form LCG; then re-derive
    * the frame stats from those samples and require them to equal the
    * registry row's output.
    */
  test("multimodal_audio_frame_energy blobs are genuine PCM16LE") {
    import org.apache.spark.sql.functions._
    val nS = graft.queries.SimOps.AudioClipSamples
    val blobs = Tables(spark, sf, "documents")
      .select(col("doc_id"), graft.queries.SimOps.audioPcm16le.as("audio"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1)
    assert(blobs.nonEmpty)
    val stats = blobs.flatMap { case (id, bytes) =>
      assert(bytes.length == 2 * nS)
      val sb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
      val samples = Array.tabulate(nS)(i => sb.get(i).toLong)
      // ByteBuffer-decoded shorts == the closed-form LCG samples.
      samples.zipWithIndex.foreach { case (got, i) =>
        val want = (id * 7919L + i * 104729L + 12345L) % 65536L - 32768L
        assert(got == want, s"doc $id sample $i: $got != $want")
      }
      samples.grouped(16).zipWithIndex.map { case (fr, f) =>
        (id, f.toLong,
          fr.map(x => x * x).sum,
          fr.map(math.abs).max,
          fr.count(x => math.abs(x) >= 32767L).toLong,
          2L * nS)
      }
    }.toSeq
    val got = Registry.byId("multimodal_audio_frame_energy").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == stats)
  }
}
