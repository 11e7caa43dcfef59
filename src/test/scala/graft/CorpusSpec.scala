package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{Codec, Corpus, Phash, Rng}

class CorpusSpec extends AnyFunSuite {

  test("raw codec roundtrips byte-exactly") {
    for (i <- 0L until 50L) {
      val px = Codec.pixels(42L, i, 16, 16)
      assert(Codec.decode(Codec.encode(px, Codec.FmtRaw)).sameElements(px))
    }
  }

  test("lq codec decodes within PSNR >= 40 dB (input_hint contract)") {
    for (i <- 0L until 200L) {
      val px = Codec.pixels(42L, i, 16, 16)
      val dec = Codec.decode(Codec.encode(px, Codec.FmtLq))
      val p = Codec.psnr(px, dec)
      assert(p >= 40.0, s"image $i psnr=$p")
      // quantization error bound: |e| <= 1 per pixel
      px.zip(dec).foreach { case (a, b) => assert(math.abs(a - b) <= 1) }
    }
  }

  test("phash recomputation from payload matches stored value") {
    val p = Corpus.Params(rows = 100)
    for (i <- 0L until 100L) {
      val r = Corpus.imageRow(p, i)
      assert(Phash.compute(Codec.decode(r.bytes), r.w, r.h) == r.phash)
    }
  }

  test("generation is a pure function of (seed, i) — partition independent") {
    val p = Corpus.Params(rows = 10)
    val a = Corpus.imageRow(p, 7L)
    val b = Corpus.imageRow(p, 7L)
    assert(a.image_id == b.image_id && a.caption == b.caption &&
      a.phash == b.phash && a.bytes.sameElements(b.bytes))
  }

  test("scratch-buffer fast path is byte-identical to the pure generator") {
    val p = Corpus.Params(rows = 500)
    val scratch = new Array[Int](p.sizes.max * p.sizes.max)
    for (i <- 0L until 500L) {
      val pure = Corpus.imageRow(p, i)
      val fast = Corpus.imageRowFast(p, i, scratch)
      assert(pure.image_id == fast.image_id)
      assert(pure.bytes.sameElements(fast.bytes), s"bytes differ at $i")
      assert(pure.phash == fast.phash, s"phash differs at $i")
      assert(pure.caption == fast.caption && pure.w == fast.w &&
        pure.h == fast.h && pure.fmt == fast.fmt)
    }
  }

  test("event times are monotone non-decreasing per entity and contain dups") {
    val p = Corpus.Params(rows = 3000)
    val rows = (0L until p.rows).map { i =>
      (Corpus.entityOf(p.seed, i, p.entities), Corpus.eventMsOf(p.seed, i, p.baseMs, p.stepMs))
    }
    var dups = 0
    rows.groupBy(_._1).foreach { case (_, es) =>
      val ts = es.map(_._2) // already in i order
      ts.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a <= b, "non-monotone per entity")
          if (a == b) dups += 1
        case _ =>
      }
    }
    assert(dups > 0, "expected duplicate-timestamp edge cases")
  }

  test("zipf entity assignment is skewed (hot prefix exists)") {
    val p = Corpus.Params(rows = 5000)
    val counts = (0L until p.rows)
      .groupBy(i => Corpus.entityOf(p.seed, i, p.entities)).view.mapValues(_.size)
    val max = counts.values.max
    assert(max > 2 * p.rows.toInt / p.entities, s"max=$max not skewed")
  }

  test("rng mix is stable across calls (golden values)") {
    assert(Rng.mix(0L) == Rng.mix(0L))
    assert(Rng.hash(42L, 0L) != Rng.hash(42L, 1L))
    assert(Rng.double01(Rng.hash(42L, 5L)) >= 0.0 && Rng.double01(Rng.hash(42L, 5L)) < 1.0)
  }
}
