package graft

import graft.nested.{NestedOps, NestedExpr, syntax}
import syntax._
import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) round-trip properties over the core
  * operators — the invariants that must hold for ANY data, not just the
  * fixtures: pack∘unpack identity, element-filter ≡ explode-filter-repack,
  * within-cell sort is a per-cell permutation, per-row reductions agree
  * with their exploded groupBy equivalents. */
class RoundTripPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomChild(seed: Int, nKeys: Int = 40, maxPerKey: Int = 6) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until nKeys).flatMap { k =>
      (0 until rnd.nextInt(maxPerKey + 1)).map { _ =>
        (k.toLong, rnd.nextInt(100), rnd.nextDouble() * 10,
          if (rnd.nextInt(5) == 0) null else s"s${rnd.nextInt(8)}")
      }
    }
    rnd.shuffle(rows).toDF("key", "c", "d", "tag")
  }

  test("property: packFlat then toFlat is a multiset identity") {
    for (seed <- Seq(1, 7, 42)) {
      val flat = randomChild(seed)
      val packed = NestedOps.packFlat(flat, Seq("key"), "n")
      val back = packed.toFlat("n", baseCols = Seq("key"))
      // multiset equality both directions (ignores order, catches dup/loss)
      assert(back.exceptAll(flat).isEmpty && flat.exceptAll(back).isEmpty,
        s"round-trip multiset mismatch at seed=$seed")
    }
  }

  test("property: filterElements ≡ explode → filter → repack") {
    for (seed <- Seq(2, 13)) {
      val flat = randomChild(seed)
      val packed = NestedOps.packFlat(flat, Seq("key"), "n")
      val viaHof = NestedOps.filterElements(packed, "n",
          e => e.getField("c") >= 50)
        .toFlat("n", baseCols = Seq("key"))
      val viaExplode = flat.where($"c" >= 50)
      assert(viaHof.exceptAll(viaExplode).isEmpty &&
        viaExplode.exceptAll(viaHof).isEmpty,
        s"filterElements semantics mismatch at seed=$seed")
    }
  }

  test("property: sortElements emits a per-cell sorted permutation") {
    for (seed <- Seq(3, 21)) {
      val packed = NestedOps.packFlat(randomChild(seed), Seq("key"), "n")
      val sorted = NestedOps.sortElements(packed, "n",
        Seq(("c", true), ("d", false)))
      val rows = sorted.select($"key",
          expr("transform(n, e -> struct(e.c, e.d))").as("cells"))
        .as[(Long, Seq[(Int, Double)])].collect()
      val orig = packed.select($"key",
          expr("transform(n, e -> struct(e.c, e.d))").as("cells"))
        .as[(Long, Seq[(Int, Double)])].collect().toMap
      rows.foreach { case (k, cells) =>
        // sorted by (c asc, d desc)...
        val expected = orig(k).sortBy { case (c, d) => (c, -d) }
        assert(cells == expected, s"cell sort mismatch key=$k seed=$seed")
      }
    }
  }

  test("property: per-row element reductions agree with exploded groupBy") {
    for (seed <- Seq(5, 31)) {
      val flat = randomChild(seed)
      val packed = NestedOps.packFlat(flat, Seq("key"), "n")
      val viaRow = packed.select($"key",
          round(NestedOps.elementSum("n", "d"), 6).as("s"),
          round(NestedOps.elementMean("n", "d"), 6).as("m"))
        .where($"s".isNotNull)
      val viaGroup = flat.groupBy("key")
        .agg(round(sum($"d"), 6).as("s"), round(avg($"d"), 6).as("m"))
      // sum order differs (fold vs partial agg) — compare at 1e-6 rounding
      assert(viaRow.exceptAll(viaGroup).isEmpty &&
        viaGroup.exceptAll(viaRow).isEmpty,
        s"reduction mismatch at seed=$seed")
    }
  }

  test("property: eval reductions match SQL aggregates on exploded data") {
    for (seed <- Seq(8, 19)) {
      val flat = randomChild(seed).where($"tag".isNotNull)
      val packed = NestedOps.packFlat(flat, Seq("key"), "n")
      // per-cell reductions are the elementReduction extension since the
      // r8 parity fix (the dialect spelling is the global Series value)
      val viaEval = packed
        .withColumn("sd", NestedExpr.elementReduction("n", "d", "std"))
        .withColumn("md", NestedExpr.elementReduction("n", "d", "median"))
        .where($"sd".isNotNull)
        .select($"key", round($"sd", 6).as("sd"), round($"md", 6).as("md"))
      val viaSql = flat.groupBy("key")
        .agg(round(stddev_samp($"d"), 6).as("sd"),
          round(expr("percentile(d, 0.5)"), 6).as("md"))
        .where($"sd".isNotNull)
      assert(viaEval.exceptAll(viaSql).isEmpty &&
        viaSql.exceptAll(viaEval).isEmpty,
        s"eval reduction mismatch at seed=$seed")
    }
  }

  test("property: asofJoin ≡ naive max-per-pair formulation") {
    import graft.operators.Joins
    for (seed <- Seq(4, 19)) {
      val rnd = new scala.util.Random(seed)
      val left = (0 until 300).map(i =>
        (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
        .toDF("eid", "k", "ts")
      val right = (0 until 200).map(i =>
        (1000L + i, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong,
          rnd.nextInt(100).toDouble)).toDF("rid", "k", "ts", "v")
      val sweep = Joins.asofJoin(left, right, "k", "ts",
          rightTieBreak = Seq("rid"))
        .select($"eid", $"rid", $"v")
      // naive reference: max (ts, rid) right row per left among ts <= l.ts
      val naive = left.as("l").join(
          right.select($"k", $"ts".as("rts"), $"rid", $"v"), Seq("k"), "left")
        .where($"rts".isNull || $"rts" <= $"ts")
        .groupBy($"eid")
        .agg(max_by(struct($"rid", $"v"),
          struct($"rts", $"rid")).as("m"))
        .select($"eid", $"m.rid", $"m.v")
      // the naive where() drops no-match lefts entirely; re-add them
      val naiveAll = left.select($"eid")
        .join(naive, Seq("eid"), "left")
      assert(sweep.exceptAll(naiveAll).isEmpty &&
        naiveAll.exceptAll(sweep).isEmpty, s"asof mismatch seed=$seed")
    }
  }

  test("property: rangeJoin ≡ naive inequality join") {
    import graft.operators.Joins
    for (seed <- Seq(6, 28)) {
      val rnd = new scala.util.Random(seed)
      val left = (0 until 200).map(i =>
        (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(500).toLong))
        .toDF("eid", "k", "ts")
      val right = (0 until 300).map(i =>
        (1000L + i, rnd.nextInt(6).toLong, rnd.nextInt(500).toLong))
        .toDF("rid", "k", "ts")
      val banded = Joins.rangeJoin(left, right, "k", "ts", 37L)
        .select($"eid", $"r_rid")
      val naive = left.join(
          right.select($"k", $"rid".as("r_rid"), $"ts".as("rts")), Seq("k"))
        .where($"rts" >= $"ts" && $"rts" < $"ts" + 37L)
        .select($"eid", $"r_rid")
      assert(banded.exceptAll(naive).isEmpty &&
        naive.exceptAll(banded).isEmpty, s"range mismatch seed=$seed")
    }
  }

  test("property: corpus paragraph dedup keeps each eligible para exactly once") {
    import graft.operators.{Dedup => D}
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      // small paragraph vocabulary → guaranteed cross-doc repeats
      val vocab = (0 until 12).map(i => s"para $i ${"x" * rnd.nextInt(4)}")
      val docs = (0L until 50L).map { id =>
        (id, (0 until 1 + rnd.nextInt(5))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString("\n"))
      }.toDF("doc_id", "text")
      val out = D.dedupParagraphs(docs, "doc_id", "text")
      val keptParas = out.select(explode(split($"clean_text", "\n")).as("p"))
        .where(length(trim($"p")) >= 2)
        .groupBy($"p").count().collect()
      // exactly-once corpus-wide
      assert(keptParas.forall(_.getLong(1) == 1L), s"seed=$seed")
      // every vocab para that appeared anywhere survives somewhere
      val appeared = docs.select(explode(split($"text", "\n")).as("p"))
        .distinct().count()
      assert(keptParas.length.toLong == appeared, s"seed=$seed")
      // per-doc: kept paragraphs are a subsequence of the original
      val pairs = docs.join(out, "doc_id")
        .select($"text", $"clean_text").as[(String, String)].collect()
      pairs.foreach { case (orig, clean) =>
        val o = orig.split("\n", -1)
        val c = clean.split("\n", -1).filter(_.nonEmpty)
        var i = 0
        c.foreach { p =>
          val j = o.indexWhere(_ == p, i)
          assert(j >= 0, s"'$p' out of order, seed=$seed")
          i = j + 1
        }
      }
    }
  }

  test("property: in-doc paragraph dedup ≡ per-doc keep-first") {
    import graft.operators.{Dedup => D}
    for (seed <- Seq(9, 23)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 40L).map { id =>
        (id, (0 until 1 + rnd.nextInt(6))
          .map(_ => s"p${rnd.nextInt(4)}").mkString("\n"))
      }.toDF("doc_id", "text")
      val got = docs.select($"doc_id",
          D.dedupParagraphsInDoc($"text").as("t"))
        .as[(Long, String)].collect().toMap
      docs.as[(Long, String)].collect().foreach { case (id, t) =>
        val expected = t.split("\n", -1).distinct.mkString("\n")
        assert(got(id) == expected, s"doc=$id seed=$seed")
      }
    }
  }

  test("property: packFlatCapped kept ∪ overflow ≡ child, with the two " +
      "outputs evaluated INDEPENDENTLY (r7 determinism contract)") {
    // the ADVICE r6 failure mode: each returned DataFrame re-ran the rank,
    // so a nondeterministic order could route a row into both or neither.
    // The order is now total (sortBy + full-payload tie-break) — unpacked
    // kept + overflow must reassemble the child as a multiset, across
    // sortBys with heavy ties AND no sortBy at all, on every evaluation.
    for (seed <- Seq(5, 17); sortBy <- Seq(Nil, Seq(("tag", true)))) {
      val child = randomChild(seed, nKeys = 25, maxPerKey = 8)
        .where($"tag".isNotNull) // NULL sort keys orderable but noisy here
      val (packed, overflow) = NestedOps.packFlatCapped(
        child, Seq("key"), "n", maxPerKey = 2, sortBy = sortBy)
      // independent evaluations: each side is its own job, twice
      (1 to 2).foreach { _ =>
        val keptFlat = packed.toFlat("n", baseCols = Seq("key"))
          .select("key", "c", "d", "tag")
        val reunion = keptFlat.unionByName(
          overflow.select("key", "c", "d", "tag"))
        assert(reunion.exceptAll(child).isEmpty &&
          child.exceptAll(reunion).isEmpty,
          s"kept ∪ overflow ≠ child at seed=$seed sortBy=$sortBy")
        // and the cap is exact
        assert(packed.select(max(size($"n"))).as[Int].collect().head <= 2)
      }
    }
  }

  test("property: selectColumns re-nests exactly the all-list prefixes " +
      "not rejected, flattens the rest (reference io ruleset)") {
    import graft.sources.NestedParquet
    import org.apache.spark.sql.types.{ArrayType, StructType}
    // frame with one nest, one all-list struct, one mixed struct, one base
    val df = Seq((0L, Seq(1, 2), Seq("x", "y"), 5, "s0"),
        (1L, Seq(3), Seq("z"), 6, "s1"))
      .toDF("id", "l1", "l2", "v", "name")
      .select($"id", $"name",
        expr("transform(l1, x -> struct(x AS a))").as("nest"),
        struct($"l1".as("la"), $"l2".as("lb")).as("slist"),
        struct($"v".as("va"), $"l1".as("lc")).as("smix"))
    val leaves = Map(
      "nest" -> Seq("a"), "slist" -> Seq("la", "lb"),
      "smix" -> Seq("va", "lc"))
    def leafList(p: String, f: String): Boolean =
      p == "nest" || (p == "slist") || (p == "smix" && f == "lc")
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 25) {
      // random request: some bases + a random nonempty leaf subset of a
      // random subset of prefixes, with a random reject set
      val bases = Seq("id", "name").filter(_ => rnd.nextBoolean())
      val prefixes = leaves.keys.toSeq.sorted.filter(_ => rnd.nextBoolean())
      val req = prefixes.flatMap { p =>
        val fs = rnd.shuffle(leaves(p)).take(1 + rnd.nextInt(leaves(p).size))
        fs.map(f => s"$p.$f")
      }
      val reject = leaves.keys.toSeq.sorted.filter(_ => rnd.nextInt(4) == 0)
      if (req.nonEmpty || bases.nonEmpty) {
        val out = NestedParquet.selectColumns(df, bases ++ req, reject)
        // model: a prefix re-nests iff not rejected and every requested
        // leaf extraction is list-typed
        val byP = req.groupBy(_.split("\\.")(0))
          .map { case (p, cs) => p -> cs.map(_.split("\\.")(1)) }
        val expected = bases ++ byP.toSeq.sortBy(t => req.indexWhere(
            _.startsWith(t._1 + "."))).flatMap { case (p, fs) =>
          val renest = !reject.contains(p) && fs.forall(leafList(p, _))
          if (renest) Seq(p) else fs
        }
        assert(out.columns.toSeq.sorted == expected.sorted,
          s"req=$req reject=$reject got=${out.columns.toSeq}")
        // every re-nested output is array<struct>; flattened leaves are not
        byP.foreach { case (p, fs) =>
          val renest = !reject.contains(p) && fs.forall(leafList(p, _))
          if (renest)
            assert(out.schema(p).dataType match {
              case ArrayType(_: StructType, _) => true; case _ => false },
              s"$p should be a nest: req=$req reject=$reject")
          else fs.foreach { f =>
            assert(!out.schema(f).dataType.isInstanceOf[StructType],
              s"$f should be a flat leaf: req=$req reject=$reject")
          }
        }
        assert(out.count() == 2)
      }
    }
  }

  test("property: splitNested partitions each cell's elements by value") {
    for (seed <- Seq(5, 21)) {
      val flat = randomChild(seed)
      val packed = NestedOps.packFlat(flat, Seq("key"), "n")
      val values = Seq("s0", "s1", "s2")
      val split = NestedOps.splitNested(packed, "n", "tag", values)
      // every split nest holds exactly the elements with that tag, and
      // their union (plus untagged/other elements dropped by split) is
      // bounded by the original cell
      val back = values.map { v =>
        split.select(col("key"), explode(col(s"n_$v")).as("e"))
          .select(col("key"), col("e.c"), col("e.d"), col("e.tag"))
      }.reduce(_ unionByName _)
      val expected = flat.where(col("tag").isin(values: _*))
      assert(back.exceptAll(expected).isEmpty &&
        expected.exceptAll(back).isEmpty,
        s"splitNested partition mismatch at seed=$seed")
    }
  }

  test("property: dropNaElements(subset) ≡ explode → notNull filter → " +
      "repack") {
    for (seed <- Seq(3, 17)) {
      val flat = randomChild(seed)
      val packed = NestedOps.packFlat(flat, Seq("key"), "n")
      val viaOp = NestedOps.dropNaElements(packed, "n", Seq("tag"))
        .toFlat("n", baseCols = Seq("key"))
      val viaExplode = flat.where(col("tag").isNotNull)
      assert(viaOp.exceptAll(viaExplode).isEmpty &&
        viaExplode.exceptAll(viaOp).isEmpty,
        s"dropNaElements semantics mismatch at seed=$seed")
    }
  }

  test("property: fillNaElements touches ONLY null fields") {
    for (seed <- Seq(8, 29)) {
      val flat = randomChild(seed)
      val packed = NestedOps.packFlat(flat, Seq("key"), "n")
      val filled = NestedOps.fillNaElements(packed, "n", Map("tag" -> "zz"))
        .toFlat("n", baseCols = Seq("key"))
      val expected = flat.withColumn("tag",
        coalesce(col("tag"), lit("zz")))
      assert(filled.exceptAll(expected).isEmpty &&
        expected.exceptAll(filled).isEmpty,
        s"fillNaElements semantics mismatch at seed=$seed")
    }
  }
}
