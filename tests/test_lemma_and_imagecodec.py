"""Round-4 units: rule-based lemma approximation (E11 fidelity,
reference `abstract_preprocessor.py:387-410`) and the pure-stdlib
PNG/BMP codec behind the real multimodal decode."""

from __future__ import annotations

import duckdb
import pytest

from swisscourtrulingcorpus_spark.extraction.imagecodec import (
    UnsupportedImageError,
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp24,
    encode_png,
)
from swisscourtrulingcorpus_spark.functions.text import (
    lemma_case_sql,
    lemma_stopword_sql,
)


def _lemmatize(token: str, lang: str) -> str:
    sql = lemma_case_sql("t", "lang")
    return duckdb.sql(
        f"SELECT {sql} FROM (VALUES ('{token}', '{lang}')) AS v(t, lang)"
    ).fetchone()[0]


def _is_stop(token: str, lang: str) -> bool:
    sql = lemma_stopword_sql("t", "lang")
    return duckdb.sql(
        f"SELECT {sql} FROM (VALUES ('{token}', '{lang}')) AS v(t, lang)"
    ).fetchone()[0]


@pytest.mark.parametrize(
    "token,lang,want",
    [
        # German: reference-style legal vocabulary
        ("erwägungen", "de", "erwägung"),
        ("vorinstanzen", "de", "vorinstanz"),
        ("entscheidungen", "de", "entscheidung"),
        ("möglichkeiten", "de", "möglichkeit"),
        ("gerichte", "de", "gericht"),
        ("bundesgericht", "de", "bundesgericht"),  # no rule applies
        ("akten", "de", "akt"),
        # French
        ("considérations", "fr", "considération"),
        ("jugements", "fr", "jugement"),
        ("tribunaux", "fr", "tribunal"),
        ("recours", "fr", "recours"),  # -cours invariant (r05)
        ("jours", "fr", "jour"),  # ...but -ours still strips
        # Italian
        ("decisioni", "it", "decisione"),
        ("documenti", "it", "documento"),
        ("giudici", "it", "giudice"),  # -dici class (r05)
        ("sentenze", "it", "sentenza"),
        ("uffici", "it", "ufficio"),
        # unknown language: pass-through
        ("tables", "en", "tables"),
    ],
)
def test_lemma_rules_golden(token, lang, want):
    assert _lemmatize(token, lang) == want


def test_min_stem_guard_blocks_overstripping():
    # 'des' (3 chars) must NOT strip to '' / 'd'
    assert _lemmatize("des", "de") == "des"
    assert _lemmatize("see", "de") == "see"


def test_stopword_pos_proxy():
    assert _is_stop("der", "de") and _is_stop("les", "fr") and _is_stop("della", "it")
    assert not _is_stop("gericht", "de")
    assert not _is_stop("der", "fr")  # per-language lists


# ---------------------------------------------------------------------------
# image codec
# ---------------------------------------------------------------------------


def test_png_round_trip_every_filter_and_channel_count():
    for nch in (1, 2, 3, 4):
        for f in range(5):
            w, h = 5, 4
            px = bytes(
                (x * 7 + y * 13 + c * 29 + f) % 256
                for y in range(h)
                for x in range(w)
                for c in range(nch)
            )
            data = encode_png(w, h, nch, px, filter_for_row=lambda y, f=f: f)
            got = decode_png(data)
            assert got[:3] == (w, h, nch)
            assert bytes(got[3]) == px


def test_bmp_round_trip_row_padding():
    for w in (1, 2, 3, 5):  # widths exercising 4-byte row padding
        h = 3
        px = bytes(
            (x * 11 + y * 17 + c * 3) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        assert bytes(decode_bmp(encode_bmp24(w, h, px))[3]) == px


def test_unsupported_formats_raise():
    with pytest.raises(UnsupportedImageError):
        decode_image(b"\xff\xd8\xff\xe0 JFIF-ish")
    with pytest.raises(UnsupportedImageError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)


def test_decode_image_features_end_to_end(spark):
    from swisscourtrulingcorpus_spark.extraction.multimodal import (
        decode_image_features,
        generate_image_fixture,
    )

    df = spark.range(8).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r.asDict()
        for r in decode_image_features(generate_image_fixture(df)).collect()
    }
    assert len(got) == 8
    for d, row in got.items():
        w, h = d % 4 + 2, d % 3 + 2
        nch = 4 if (d % 2 == 0 and d % 4 == 0) else 3
        vals = [
            (d + 7 * x + 13 * y + 29 * c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(nch)
        ]
        assert row["fmt"] == ("png" if d % 2 == 0 else "bmp")
        assert (row["width"], row["height"], row["channels"]) == (w, h, nch)
        assert row["pixel_sum"] == sum(vals)
        assert row["px_min"] == min(vals) and row["px_max"] == max(vals)


def test_apply_token_vocab_paths_agree(spark):
    """Literal-map and broadcast-join vocabulary application must
    produce identical (id, pos, token_id) rows; the join path is the
    plan for real BPE-size vocabularies (r03 VERDICT item 8)."""
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.operators.training import (
        apply_token_vocab,
    )

    docs = spark.createDataFrame(
        [(1, ["a", "b", "oov", "a"]), (2, ["c", "b"]), (3, [])],
        "doc_id: long, toks: array<string>",
    )
    vocab = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "token: string, vocab_id: int"
    )
    lit_rows = sorted(
        tuple(r)
        for r in apply_token_vocab(docs, vocab, "doc_id", "toks").collect()
    )
    join_rows = sorted(
        tuple(r)
        for r in apply_token_vocab(
            docs, vocab, "doc_id", "toks", literal_max=1
        ).collect()
    )
    assert lit_rows == join_rows
    assert (1, 2, 0) in lit_rows  # OOV -> 0

    # join path must be a broadcast, never a shuffle of the corpus
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        apply_token_vocab(docs, vocab, "doc_id", "toks", literal_max=1).explain(
            mode="formatted"
        )
    assert "BroadcastHashJoin" in buf.getvalue()


def test_length_shards_monotone_and_balanced(spark):
    """Shards are contiguous in length order, sizes differ by at most
    one, and the result is identical at different parallelism (the
    two-phase rank is boundary-invariant)."""
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.operators.training import (
        length_grouped_shards,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 200 + 1) for i in range(333)], "doc_id: long, n: long"
    )
    out = length_grouped_shards(df, "n", "doc_id", n_shards=8).collect()
    rows = sorted(((r["n"], r["doc_id"]), r["shard"]) for r in out)
    shards = [s for _, s in rows]
    assert shards == sorted(shards)  # contiguous in length order
    from collections import Counter

    sizes = Counter(shards)
    assert set(sizes) == set(range(1, 9))
    assert max(sizes.values()) - min(sizes.values()) <= 1

    redist = length_grouped_shards(
        df.repartition(13), "n", "doc_id", n_shards=8
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, redist))


def test_png_codec_property_random_images():
    """Property: encode->decode is the identity for random pixel
    buffers, sizes, channel counts and per-row filter choices."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 9),
        nch=st.sampled_from([1, 2, 3, 4]),
        data=st.data(),
    )
    def check(w, h, nch, data):
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * nch,
                    max_size=w * h * nch,
                )
            )
        )
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        enc = encode_png(w, h, nch, px, filter_for_row=lambda y: filters[y])
        got_w, got_h, got_c, out = decode_png(enc)
        assert (got_w, got_h, got_c) == (w, h, nch)
        assert bytes(out) == px

    check()


def test_bmp_codec_property_random_images():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 9), h=st.integers(1, 6), data=st.data())
    def check(w, h, data):
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
                )
            )
        )
        assert bytes(decode_bmp(encode_bmp24(w, h, px))[3]) == px

    check()


def test_parallel_prefix_sum_rejects_reserved_columns(spark):
    import pytest
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.operators.training import (
        parallel_prefix_sum,
    )

    # the r11 multi-column refactor indexed the working columns
    # (__val0, __local0, ...), so the UNindexed names are no longer
    # reserved — a caller column named __val now passes through
    # unharmed, and the indexed names fail loudly
    df = spark.createDataFrame([(1, 5)], "id: long, __val0: long")
    with pytest.raises(ValueError, match="__val0"):
        parallel_prefix_sum(df, [F.col("id")], F.lit(1), "rank")
    ok = spark.createDataFrame([(1, 5)], "id: long, __val: long")
    got = parallel_prefix_sum(ok, [F.col("id")], F.lit(1), "rank").collect()
    assert got[0]["__val"] == 5 and got[0]["rank"] == 1
    # the out_col itself is reserved too
    with pytest.raises(ValueError, match="rank"):
        parallel_prefix_sum(
            spark.createDataFrame([(1, 2)], "id: long, rank: long"),
            [F.col("id")],
            F.lit(1),
            "rank",
        )


def test_pack_sequences_null_length_keeps_position(spark):
    """A NULL-length doc occupies zero tokens but keeps a DEFINED
    position (token_start/pack_id non-null; n_tokens stays NULL) — the
    refactor briefly made all three NULL (r04 review)."""
    from swisscourtrulingcorpus_spark.operators.training import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 7)], "doc_id: long, n: long"
    )
    rows = {r["doc_id"]: r for r in pack_sequences(df, "n", "doc_id", 8).collect()}
    assert rows[2]["n_tokens"] is None
    assert rows[2]["token_start"] is not None
    assert rows[2]["pack_id"] is not None and rows[2]["pack_offset"] is not None
    # zero-width: the next doc in hash order starts at the same token
    starts = sorted(r["token_start"] for r in rows.values())
    assert len(set(starts)) <= 3
