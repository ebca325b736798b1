"""Direct unit tests for round-5 operators: Morton z-order keys and the
mapInArrow chunking twin (query-level coverage lives in
test_queries_contract via the registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.functions.zorder import morton_key, morton_sql
from les_etl_pipeline_spark.operators import multimodal


def _interleave_py(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_reference_bit_interleave(spark):
    pts = [(x, y) for x in (0, 1, 3, 5, 42, 63) for y in (0, 2, 7, 31, 63)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton_key(F.col("x"), F.col("y"), 6).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _interleave_py(x, y, 6), (x, y)


def test_morton_sql_matches_column_form(spark):
    df = spark.createDataFrame([(11, 29), (63, 0), (0, 63)], "x int, y int")
    df.createOrReplaceTempView("morton_pts")
    sql_rows = spark.sql(
        f"SELECT x, y, ({morton_sql('x', 'y', 6)}) AS z FROM morton_pts"
    ).collect()
    for r in sql_rows:
        assert r.z == _interleave_py(r.x, r.y, 6)


def test_morton_key_is_locality_preserving(spark):
    # nearby cells in (x, y) share high-order z bits: all 4 points of a
    # 2x2 block starting at an even (x, y) land in one z "quad".
    df = spark.createDataFrame(
        [(bx + dx, by + dy) for bx, by in [(4, 8), (32, 16)] for dx in (0, 1) for dy in (0, 1)],
        "x int, y int",
    )
    rows = df.select(
        (F.col("x") / 2).cast("int").alias("bx"),
        (F.col("y") / 2).cast("int").alias("by"),
        F.shiftright(morton_key(F.col("x"), F.col("y"), 6), 2).alias("quad"),
    ).collect()
    quads: dict[tuple[int, int], set[int]] = {}
    for r in rows:
        quads.setdefault((r.bx, r.by), set()).add(r.quad)
    assert all(len(q) == 1 for q in quads.values()), quads


def test_arrow_chunks_match_pandas_chunks(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 100), (2, "xyz"), (3, "")], "doc_id long, text string"
    )
    assets = multimodal.to_asset_table(docs)
    via_pandas = sorted(
        tuple(r) for r in multimodal.byte_chunks(assets, chunk_size=32).collect()
    )
    via_arrow = sorted(
        tuple(r) for r in multimodal.arrow_byte_chunks(assets, chunk_size=32).collect()
    )
    assert via_arrow == via_pandas
    assert len(via_arrow) == 4 + 1  # 100 bytes -> 4 chunks, "xyz" -> 1, "" -> 0


def test_zordered_write_produces_disjoint_file_ranges(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.sinks.layout import write_zordered

    df = spark.range(0, 4096).select(
        (F.col("id") % 61).cast("int").alias("x"),
        ((F.col("id") * 7) % 53).cast("int").alias("y"),
    )
    path = str(tmp_path / "zordered")
    write_zordered(df, F.col("x"), F.col("y"), path, bits=6, n_files=4)

    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "zkey"
            )
            ranges.append((col.statistics.min, col.statistics.max))
    assert len(ranges) >= 2
    ranges.sort()
    # repartitionByRange gives a total range partitioning: file/row-group
    # key ranges must not interleave (boundary equality allowed) — this
    # is exactly what makes zone-map skipping effective.
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (ranges,)


def test_cogroup_asof_matches_native_window(spark, sf_dir):
    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.catalog import table
    from les_etl_pipeline_spark.operators.grouped import cogroup_asof_pandas
    from les_etl_pipeline_spark.queries import QUERIES

    native = {
        (r["purchase_id"], r["prior_view_ts"])
        for r in QUERIES["asof_join_union_window"](spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    co = cogroup_asof_pandas(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "view"),
        "user_id",
    )
    got = {
        (r["purchase_id"], r["prior_view_ts"])
        for r in co.select(
            F.col("left_id").alias("purchase_id"),
            F.date_format("match_ts", "yyyy-MM-dd HH:mm:ss").alias("prior_view_ts"),
        ).collect()
    }
    assert got == native


def _bpe_reference(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in (t or "").split():
            if w:
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < 2:
            break
        merges.append((a, b, n))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_pure_python_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.catalog import table
    from les_etl_pipeline_spark.operators.text import bpe_train_merges

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") <= 120)
    got = bpe_train_merges(docs, n_merges=6)
    texts = [r["text"] for r in docs.select("text").collect()]
    assert got == _bpe_reference(texts, 6)
    # merges must be usable: counts positive and non-increasing is NOT
    # guaranteed by BPE (a merge can create a more frequent pair), but
    # every chosen pair must have been worth merging
    assert all(c >= 2 for _a, _b, c in got)


def test_multiformat_roundtrip_parity(spark, sf_dir, tmp_path):
    """Source/sink format coverage: the same table written and re-read
    through parquet, ORC, CSV (with header + explicit schema), and JSON
    round-trips value-identically. Avro is NOT bundled in this Spark
    distribution (external spark-avro module; verified ImportError-like
    AnalysisException) — documented env limit, same class as Delta."""
    from les_etl_pipeline_spark.catalog import table

    src = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .where(F.col("o_orderkey") <= 500)
    )
    expect = sorted(tuple(r) for r in src.collect())
    schema = src.schema

    p = str(tmp_path / "fmt_parquet")
    src.write.mode("overwrite").parquet(p)
    assert sorted(tuple(r) for r in spark.read.parquet(p).collect()) == expect

    o = str(tmp_path / "fmt_orc")
    src.write.mode("overwrite").orc(o)
    assert sorted(tuple(r) for r in spark.read.orc(o).collect()) == expect

    c = str(tmp_path / "fmt_csv")
    src.write.mode("overwrite").option("header", True).csv(c)
    got_csv = spark.read.schema(schema).option("header", True).csv(c)
    assert sorted(tuple(r) for r in got_csv.collect()) == expect

    j = str(tmp_path / "fmt_json")
    src.write.mode("overwrite").json(j)
    got_json = spark.read.schema(schema).json(j)
    assert sorted(tuple(r) for r in got_json.collect()) == expect


def test_compact_parquet_preserves_data_and_shrinks_files(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.sinks.layout import compact_parquet

    path = str(tmp_path / "many_small")
    # simulate a streaming landing zone: 16 tiny appends
    for i in range(16):
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).write.mode("append").parquet(path)
    before_files = len(glob.glob(f"{path}/part-*.parquet"))
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    n = compact_parquet(spark, path, target_files=2, sort_col="id")
    after_files = len(glob.glob(f"{path}/part-*.parquet"))
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    assert after == before
    assert n == after_files
    assert after_files <= 2 < before_files


def test_incremental_read_high_water_mark(spark, tmp_path):
    import datetime as dt

    from les_etl_pipeline_spark.sources import incremental as inc

    path = str(tmp_path / "landing")
    state = str(tmp_path / "hwm.json")
    t0 = dt.datetime(2024, 1, 1)

    def write(rows):
        spark.createDataFrame(rows, "id long, ts timestamp_ntz").write.mode(
            "append"
        ).parquet(path)

    write([(1, t0), (2, t0 + dt.timedelta(hours=1))])
    d1 = inc.incremental_read(spark, path, "ts", state)
    assert {r["id"] for r in d1.collect()} == {1, 2}
    inc.commit_high_water_mark(d1, "ts", state)

    # re-run before new data: empty delta, mark untouched
    d_empty = inc.incremental_read(spark, path, "ts", state)
    assert d_empty.count() == 0
    mark_before = inc.read_high_water_mark(state)
    inc.commit_high_water_mark(d_empty, "ts", state)
    assert inc.read_high_water_mark(state) == mark_before

    write([(3, t0 + dt.timedelta(hours=2)), (4, t0 + dt.timedelta(minutes=30))])
    # id=4 is LATE (before the mark): an hwm read skips it by design —
    # late data belongs to the watermarked streaming path, not CDC-lite
    d2 = inc.incremental_read(spark, path, "ts", state)
    assert {r["id"] for r in d2.collect()} == {3}
    inc.commit_high_water_mark(d2, "ts", state)
    assert inc.read_high_water_mark(state).startswith("2024-01-01 02:00:00")


def test_try_sum_overflow_yields_null_not_error(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(9223372036854775807,), (9223372036854775807,), (1,)], "v long"
    )
    row = df.agg(
        F.try_sum("v").alias("s"), F.try_avg("v").alias("a")
    ).collect()[0]
    assert row["s"] is None  # overflow -> NULL, job survives


def _bpe_encode_reference(
    texts: list[tuple[int, str]], merges: list[tuple[str, str, int]]
) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for doc_id, t in texts:
        toks: list[str] = []
        for w in (t or "").split():
            if not w:
                continue
            syms = list(w)
            for a, b, _c in merges:
                merged: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                syms = merged
            toks.extend(syms)
        out[doc_id] = toks
    return out


def test_bpe_encode_matches_pure_python_reference(spark, sf_dir):
    from les_etl_pipeline_spark.catalog import table
    from les_etl_pipeline_spark.operators.text import bpe_encode, bpe_train_merges

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") <= 80)
    merges = bpe_train_merges(docs, n_merges=6)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(docs, merges, checkpoint_every=3).collect()
    }
    texts = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    want = _bpe_encode_reference(texts, merges)
    assert set(got) == {d for d, t in texts if (t or "").split()}
    for d in got:
        assert got[d] == want[d], f"doc {d}: {got[d][:8]} vs {want[d][:8]}"


def test_cms_estimate_bounds(spark, sf_dir):
    """CMS guarantees: est >= true always; est <= true + eps*N w.h.p.
    (eps = e/width). Checked for EVERY distinct token, not just heavy
    hitters."""
    import math

    from les_etl_pipeline_spark.catalog import table
    from les_etl_pipeline_spark.operators import sketches

    toks = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    n_total = toks.count()
    depth, width = 4, 2048
    sketch = sketches.cms_build(toks, "tok", depth=depth, width=width)
    truth = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_c"))
    est = sketches.cms_estimate(sketch, truth, "tok", depth=depth, width=width)
    rows = est.collect()
    assert rows, "no tokens"
    eps_bound = math.e / width * n_total
    n_over = 0
    for r in rows:
        assert r["est_c"] >= r["true_c"], f"{r['tok']}: CMS underestimated"
        if r["est_c"] > r["true_c"] + eps_bound:
            n_over += 1
    # P(overshoot > eps*N) <= (1/e)^depth ~ 1.8% per query; allow slack
    assert n_over <= max(3, 0.05 * len(rows)), f"{n_over}/{len(rows)} beyond eps bound"


def test_cms_merge_equals_single_build(spark, sf_dir):
    """Shard-and-merge == single pass: the mergeable-partial property
    that makes the sketch usable as a streaming accumulator."""
    from les_etl_pipeline_spark.catalog import table
    from les_etl_pipeline_spark.operators import sketches

    toks = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.col("doc_id") <= 200))
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    whole = sketches.cms_build(toks, "tok")
    half_a = sketches.cms_build(toks.where(F.col("doc_id") % 2 == 0), "tok")
    half_b = sketches.cms_build(toks.where(F.col("doc_id") % 2 == 1), "tok")
    merged = sketches.cms_merge(half_a, half_b)
    w = {(r["row"], r["pos"]): r["c"] for r in whole.collect()}
    m = {(r["row"], r["pos"]): r["c"] for r in merged.collect()}
    assert w == m


def test_bitmap_distinct_matches_count_distinct(spark, sf_dir):
    from les_etl_pipeline_spark.catalog import table
    from les_etl_pipeline_spark.operators import sketches

    o = table(spark, sf_dir, "orders")
    got = {
        r["o_orderstatus"]: r["n_distinct"]
        for r in sketches.bitmap_distinct(o, ["o_orderstatus"], "o_custkey").collect()
    }
    want = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == want


def test_chunk_dedup_reconstruct_properties(spark, sf_dir):
    """Idempotence-flavored invariants: every surviving chunk text is
    globally unique; per-doc n_kept <= n_total; total kept == distinct
    chunk texts in the corpus."""
    from les_etl_pipeline_spark.queries.llm_data6 import (
        CHUNK_TOKENS,
        dedup_chunk_reconstruct,
    )
    from les_etl_pipeline_spark.catalog import table

    res = dedup_chunk_reconstruct(spark, sf_dir)
    rows = res.collect()
    assert all(r["n_kept"] <= r["n_total"] for r in rows)
    total_kept = sum(r["n_kept"] for r in rows)
    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.col("text") != "")
    )
    n_distinct_chunks = (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("p", "w"))
        .withColumn("ci", (F.col("p") / CHUNK_TOKENS).cast("long"))
        .groupBy("doc_id", "ci")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "w"))), lambda s: s["w"]
                ),
            ).alias("chunk")
        )
        .select("chunk")
        .distinct()
        .count()
    )
    assert total_kept == n_distinct_chunks


def test_binaryfile_ingest_to_decoded_features(spark, tmp_path):
    """End-to-end multimodal ingest: real BMP/WAV files on disk -> the
    built-in binaryFile source -> ASSET_SCHEMA -> mime-dispatched decode.
    Glob pruning happens at listing time (the .txt distractor is never
    read)."""
    from les_etl_pipeline_spark.operators import multimodal

    d = tmp_path / "assets"
    d.mkdir()
    (d / "a.bmp").write_bytes(multimodal.encode_bmp(5, 3, 100))
    (d / "b.wav").write_bytes(multimodal.encode_wav(400, 1000))
    (d / "junk.txt").write_text("not an asset")

    assets = multimodal.read_binary_assets(spark, str(d), glob="*.{bmp,wav}")
    rows = {r["mime"]: r for r in assets.collect()}
    assert set(rows) == {"image/bmp", "audio/wav"}
    assert rows["image/bmp"]["n_bytes"] == len(multimodal.encode_bmp(5, 3, 100))

    feats = {r["mime"]: r for r in multimodal.decode_features(assets).collect()}
    img = feats["image/bmp"]
    assert (img["width"], img["height"]) == (5, 3)
    assert abs(img["mean_pixel"] - 100.0) < 1e-9
    au = feats["audio/wav"]
    assert au["sample_rate"] == 8000 and au["n_channels"] == 1
    assert abs(au["rms"] - 1000.0) < 1e-6
    assert au["duration_ms"] == 50


def test_binaryfile_doc_ids_stable(spark, tmp_path):
    from les_etl_pipeline_spark.operators import multimodal

    d = tmp_path / "assets2"
    d.mkdir()
    (d / "x.bmp").write_bytes(multimodal.encode_bmp(2, 2, 7))
    a = multimodal.read_binary_assets(spark, str(d)).select("doc_id").collect()
    b = multimodal.read_binary_assets(spark, str(d)).select("doc_id").collect()
    assert a == b and len(a) == 1


def test_image_ahash_near_dup_pairs(spark):
    """Perceptual near-dup over real decoded BMPs: a one-block edit is
    Hamming-1 from the original; the inverted image is Hamming-64 and
    must not pair. Block math is hand-checkable: 32x32 px, 8x8 blocks of
    4x4, checkerboard blocks sit at 0/255 so only the edited block's bit
    can flip."""
    from les_etl_pipeline_spark.operators import multimodal as MM

    def checker(x, y):
        return 255 if (x // 4 + y // 4) % 2 == 0 else 0

    def edited(x, y):  # one block (top-left) flipped to black
        return 0 if (x < 4 and y < 4) else checker(x, y)

    def inverted(x, y):
        return 255 - checker(x, y)

    assets = spark.createDataFrame(
        [
            (1, bytearray(MM.encode_bmp_pattern(32, 32, checker))),
            (2, bytearray(MM.encode_bmp_pattern(32, 32, edited))),
            (3, bytearray(MM.encode_bmp_pattern(32, 32, inverted))),
        ],
        "doc_id bigint, payload binary",
    )
    hashes = {r.doc_id: r.ahash for r in MM.image_ahash(assets).collect()}
    expect_checker = "".join(
        "1" if (bx + by) % 2 == 0 else "0" for by in range(8) for bx in range(8)
    )
    assert hashes[1] == expect_checker
    assert hashes[3] == "".join("1" if c == "0" else "0" for c in expect_checker)
    assert sum(a != b for a, b in zip(hashes[1], hashes[2])) == 1

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in MM.image_near_dup_pairs(assets, max_hamming=3).collect()
    }
    assert pairs == {(1, 2): 1}


def test_audio_envelope_near_dup_pairs(spark):
    """Audio face of the shared banding machinery: 6400 frames = 64
    windows of 100; loud/quiet alternating windows give a checkerboard
    envelope, editing ONE window is Hamming-1, inverting all windows is
    Hamming-64 and must not pair."""
    from les_etl_pipeline_spark.operators import multimodal as MM

    def pattern(i):
        return 20000 if (i // 100) % 2 == 0 else 1000

    def edited(i):  # window 0 silenced
        return 1000 if i < 100 else pattern(i)

    def inverted(i):
        return 1000 if (i // 100) % 2 == 0 else 20000

    assets = spark.createDataFrame(
        [
            (1, bytearray(MM.encode_wav_pattern(6400, pattern))),
            (2, bytearray(MM.encode_wav_pattern(6400, edited))),
            (3, bytearray(MM.encode_wav_pattern(6400, inverted))),
        ],
        "doc_id bigint, payload binary",
    )
    hashes = {r.doc_id: r.ehash for r in MM.audio_envelope_hash(assets).collect()}
    expect = "".join("1" if w % 2 == 0 else "0" for w in range(64))
    assert hashes[1] == expect
    assert hashes[3] == "".join("1" if c == "0" else "0" for c in expect)
    assert sum(a != b for a, b in zip(hashes[1], hashes[2])) == 1

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in MM.audio_near_dup_pairs(assets, max_hamming=3).collect()
    }
    assert pairs == {(1, 2): 1}


def test_video_signature_majority_absorbs_corrupt_frame(spark):
    """The temporal signature must equal the clean frame pattern even
    when one sampled frame is fully inverted, and frame sampling must
    only materialize every_k-th frame."""
    from les_etl_pipeline_spark.operators import multimodal as MM

    def checker(x, y):
        return 255 if (x // 4 + y // 4) % 2 == 0 else 0

    def inverted(x, y):
        return 255 - checker(x, y)

    clean = MM.encode_bmp_pattern(32, 32, checker)
    bad = MM.encode_bmp_pattern(32, 32, inverted)
    vids = spark.createDataFrame(
        [(1, bytearray(MM.encode_video([clean, clean, bad, clean, clean])))],
        "doc_id bigint, payload binary",
    )
    sampled = MM.video_frame_sample(vids, every_k=2).collect()
    assert sorted(r.frame_idx for r in sampled) == [0, 2, 4]
    expect = "".join(
        "1" if (bx + by) % 2 == 0 else "0" for by in range(8) for bx in range(8)
    )
    sig = MM.video_signature(vids, every_k=2).collect()
    assert sig[0].vhash == expect  # 2-of-3 majority absorbed the inversion


def test_fast_media_builders_byte_identical():
    """The numpy synth builders must produce byte-identical files to the
    scalar reference builders — the synth corpus (and thus the
    registry-graded multimodal queries) must not depend on which path
    built it."""
    import numpy as np

    from les_etl_pipeline_spark.operators import multimodal as MM

    bits = [(i * 7 + 3) % 3 == 0 for i in range(64)]
    blocks = np.array(bits, dtype=np.uint8).reshape(8, 8) * 255
    fast = MM._bmp_from_gray(np.kron(blocks, np.ones((4, 4), np.uint8)))
    slow = MM.encode_bmp_pattern(
        32, 32, lambda x, y: 255 if bits[(y // 4) * 8 + (x // 4)] else 0
    )
    assert fast == slow

    amps = np.repeat(np.array(bits, dtype=np.int64) * 19000 + 1000, 100)
    fastw = MM._wav_from_amplitudes(amps)
    sloww = MM.encode_wav_pattern(
        6400, lambda i: 20000 if bits[i // 100] else 1000
    )
    assert fastw == sloww
