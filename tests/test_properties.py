"""Property-based tests (hypothesis) for the behavior-laden scalar layer.

SURVEY §7.3 flags smart_cast/inference as the riskiest semantics. The
golden tests pin the reference's exact examples; these pin the *laws*
over generated inputs. Each example set rides ONE DataFrame per test run
(a Spark job per hypothesis example would be seconds each).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from udata_datalake_service_spark.functions.casting import smart_cast
from udata_datalake_service_spark.operators.core import deterministic_sample


def _cast_all(spark, values: list[str], python_type: str) -> list:
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [
        r["out"] for r in df.select(smart_cast(python_type, F.col("raw")).alias("out")).collect()
    ]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False).map(
            lambda f: round(f, 2)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_smart_cast_float_roundtrips_french_formats(spark, floats):
    """For any 2-decimal float rendered French-style ('1 234,56'),
    smart_cast('float') recovers the value exactly."""
    rendered = [
        f"{f:,.2f}".replace(",", " ").replace(".", ",") for f in floats
    ]
    got = _cast_all(spark, rendered, "float")
    assert got == [float(f"{f:.2f}") for f in floats]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=30))
def test_smart_cast_int_roundtrips_plain_and_float_strings(spark, ints):
    """Plain int strings and 'n.0' float strings both yield the int —
    except the reference's ``if _value:`` quirk maps the 0.0 string to
    NULL (analysis/csv.py:210-213)."""
    plain = _cast_all(spark, [str(n) for n in ints], "int")
    assert plain == ints
    floaty = _cast_all(spark, [f"{n}.0" for n in ints], "int")
    assert floaty == [n if n != 0 else None for n in ints]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Zs")),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_smart_cast_non_numeric_text_is_null_never_error(spark, texts):
    """Failsafe law: arbitrary non-numeric text casts to NULL for
    int/float — never an exception (the reference's failsafe=True)."""
    # Spark's double cast DOES accept the letter-only spellings of IEEE
    # specials ("NaN", "Infinity", "inf") — those are numeric by design,
    # not a failsafe violation, so the digitless-source law excludes them.
    ieee = {"nan", "inf", "infinity", "+inf", "-inf", "+infinity", "-infinity"}
    for t in ("int", "float"):
        got = _cast_all(spark, texts, t)
        # anything that did come through must have digits in its source
        for v, s in zip(got, texts):
            if v is not None and s.strip().lower() not in ieee:
                assert any(ch.isdigit() for ch in s)


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=1, max_value=60), st.integers(min_value=0, max_value=10**6))
def test_deterministic_sample_laws(spark, n, seed_num):
    """|sample| == min(n, |df|); sample ⊆ df; same seed → same sample."""
    df = spark.range(40).select(F.col("id").alias("k"))
    seed = f"s{seed_num}"
    a = sorted(r["k"] for r in deterministic_sample(df, n, ["k"], seed=seed).collect())
    b = sorted(r["k"] for r in deterministic_sample(df, n, ["k"], seed=seed).collect())
    assert a == b
    assert len(a) == min(n, 40)
    assert set(a) <= set(range(40))


# ------------------------------------------------- inference vote laws ----
from udata_datalake_service_spark.sources.inference import infer_types  # noqa: E402


def _infer_one(spark, values: list[str | None]) -> str:
    df = spark.createDataFrame([(v,) for v in values], "c string")
    return infer_types(df)["c"]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=20))
def test_infer_int_for_any_int_column_even_with_blanks(spark, ints):
    """Rendered ints vote int; interleaved blanks/NULLs never flip the
    vote (blanks count for every candidate, like csv_detective). The "7"
    sentinel keeps the column out of bool territory — hypothesis found
    that an all-0/1 column correctly infers bool (higher priority)."""
    vals = [str(n) for n in ints] + ["7", "", None]
    assert _infer_one(spark, vals) == "int"


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**30), max_value=2**30), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=10**6),
)
def test_infer_float_once_a_fractional_value_appears(spark, ints, frac):
    """One non-integral value demotes an int column to float — never to
    string (int is a strict subset of float in the priority vote)."""
    vals = [str(n) for n in ints] + [f"0.{frac}5"]
    assert _infer_one(spark, vals) == "float"


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**30), max_value=2**30), min_size=1, max_size=20),
    st.text(alphabet="zqxkw", min_size=3, max_size=8),
)
def test_infer_one_junk_value_demotes_to_string(spark, ints, junk):
    """A single unparseable token anywhere forces string — the vote
    requires zero failures, exactly like csv_detective's full-file pass
    (no sampling shortcuts that would mistype row N)."""
    vals = [str(n) for n in ints] + [junk]
    assert _infer_one(spark, vals) == "string"


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.sampled_from(["true", "false", "YES", "No", "vrai", "faux", "OK"]),
        min_size=1,
        max_size=20,
    )
)
def test_infer_bool_wins_over_string_for_marker_values(spark, bools):
    assert _infer_one(spark, bools) == "bool"


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.dates(min_value=__import__("datetime").date(1971, 1, 1),
                 max_value=__import__("datetime").date(2099, 12, 31)),
        min_size=1,
        max_size=20,
    ),
    st.booleans(),
)
def test_infer_date_vs_datetime_split_on_time_component(spark, dates, with_time):
    """ISO dates infer date; appending a clock component to every value
    flips the column to datetime (the reference's date/datetime split)."""
    if with_time:
        vals = [f"{d.isoformat()} 12:30:00" for d in dates]
        assert _infer_one(spark, vals) == "datetime"
    else:
        vals = [d.isoformat() for d in dates]
        assert _infer_one(spark, vals) == "date"


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=6),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=0, max_value=9),
)
def test_chunking_partitions_every_token(spark, doc_lens, size, overlap):
    """For any corpus/size/overlap: chunks of a doc start at 1, step by
    stride, the union of [start, start+len-1] covers 1..n exactly with
    per-chunk overlap = `overlap` (except a shorter tail), and no chunk is
    fully contained in its predecessor."""
    from udata_datalake_service_spark.llm.packing import chunk_documents

    if overlap >= size:
        overlap = size - 1
    stride = size - overlap
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(n)))
        for i, n in enumerate(doc_lens)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, size=size, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(doc_lens):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_idx"])
        assert chunks, (i, n)
        covered = set()
        prev_end = 0
        for j, c in enumerate(chunks):
            assert c["chunk_idx"] == j
            assert c["start_token"] == 1 + j * stride
            end = c["start_token"] + c["n_chunk_tokens"] - 1
            assert end > prev_end  # never fully inside the previous chunk
            covered.update(range(c["start_token"], end + 1))
            prev_end = end
        assert covered == set(range(1, n + 1))


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=12), min_size=2, max_size=5))
def test_span_coverage_bounds_and_verbatim_dup(spark, doc_lens):
    """Invariants for any corpus: ratios in [0,1], dup windows ≤ windows,
    covered ≤ tokens; and a doc duplicated verbatim (when long enough for
    ≥1 window) reports FULL coverage on both copies."""
    from udata_datalake_service_spark.llm.dedup import duplicated_span_coverage

    span = 3
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(n)))
        for i, n in enumerate(doc_lens)
    ]
    # duplicate doc 0 verbatim under a fresh id
    rows.append((1000, rows[0][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicated_span_coverage(df, span=span).collect()}
    assert set(out) == {i for i in range(len(doc_lens))} | {1000}
    for r in out.values():
        assert 0 <= r["n_dup_windows"] <= r["n_windows"]
        assert 0 <= r["covered_tokens"] <= r["n_tokens"]
        assert 0.0 <= r["dup_window_ratio"] <= 1.0
        assert 0.0 <= r["coverage"] <= 1.0
    if doc_lens[0] >= span:
        assert out[0]["coverage"] == 1.0 and out[1000]["coverage"] == 1.0
        assert out[0]["n_dup_windows"] == out[0]["n_windows"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),           # user
            st.integers(min_value=0, max_value=10_000),      # ts offset s
            st.sampled_from(["a", "b", "c", "d"]),           # event
        ),
        min_size=2,
        max_size=60,
    )
)
def test_transition_probabilities_form_a_distribution(spark, events):
    """Laws: per prev_event, Σp ≈ 1 (rounding-limited), ranks are a
    1..k permutation ordered by (n desc, name asc), and Σn equals the
    number of adjacencies (rows − distinct users with ≥1 event)."""
    from collections import Counter

    from udata_datalake_service_spark.operators.markov import event_transitions

    df = (
        spark.createDataFrame(
            [(i, u, off, e) for i, (u, off, e) in enumerate(events)],
            "event_id long, user_id long, off long, event_type string",
        )
        .withColumn("ts", F.expr("timestamp '2024-01-01' + make_interval(0,0,0,0,0,0,off)"))
    )
    out = event_transitions(df).collect()
    n_users = len({u for u, _, _ in events})
    assert sum(r["n"] for r in out) == len(events) - n_users
    by_prev: dict = {}
    for r in out:
        by_prev.setdefault(r["prev_event"], []).append(r)
    for prev, rs in by_prev.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-4 * len(rs)
        ranked = sorted(rs, key=lambda r: (-r["n"], r["next_event"]))
        assert [r["rnk"] for r in ranked] == list(range(1, len(rs) + 1))


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab #.\n…•xyz"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=8,
    )
)
def test_gopher_signal_bounds(spark, texts):
    """Laws over arbitrary junk text: every *_frac signal is ≥ 0; line/
    word fraction signals are ≤ 1; n_fail counts exactly the violated
    thresholds given the emitted signal columns."""
    from udata_datalake_service_spark.llm.gopher import (
        DUP_MAX,
        TOP_MAX,
        gopher_quality,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in gopher_quality(df).collect():
        d = r.asDict()
        for k, v in d.items():
            if k.endswith("_frac") or k.endswith("frac"):
                assert v >= 0.0, (k, v)
        for k in (
            "frac_alpha_words", "bullet_line_frac", "ellipsis_line_frac",
            "dup_line_frac", "dup_line_char_frac",
        ):
            assert d[k] <= 1.0 + 1e-9, (k, d[k])
        expected_fails = sum([
            d["n_words"] < 50 or d["n_words"] > 100_000,
            d["mean_word_len"] < 3.0 or d["mean_word_len"] > 10.0,
            d["symbol_word_ratio"] > 0.10,
            d["bullet_line_frac"] > 0.90,
            d["ellipsis_line_frac"] > 0.30,
            d["frac_alpha_words"] < 0.80,
            d["n_stop_hits"] < 2,
            d["dup_line_frac"] > 0.30,
            d["dup_line_char_frac"] > 0.20,
            *[d[f"top{n}gram_char_frac"] > TOP_MAX[n] for n in (2, 3, 4)],
            *[d[f"dup{n}gram_char_frac"] > DUP_MAX[n] for n in range(5, 11)],
        ])
        assert d["n_fail"] == expected_fails
        assert d["gopher_pass"] == (expected_fails == 0)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("abcd efg"), min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    )
)
def test_bpe_encode_reconstructs_tokens(spark, texts):
    """Law: for ANY merge table, stripping ``</w>`` boundaries from the
    encoded pieces reconstructs the normalized token stream exactly —
    BPE merging never loses or reorders characters."""
    from udata_datalake_service_spark.llm.bpe import END, bpe_encode, bpe_train
    from udata_datalake_service_spark.llm.text import TOKEN_SPLIT_RE
    import re

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(df, num_merges=4)
    enc = {r["doc_id"]: r["pieces"] for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        toks = [w for w in re.split(TOKEN_SPLIT_RE, t.lower()) if w]
        rebuilt = "".join(enc[i]).replace(END, " ").split()
        assert rebuilt == toks


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-2.0, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=10),
)
def test_weighted_sample_laws(spark, weights, n):
    """Laws: at most n winners, all from the positive-weight subset,
    deterministic across runs, and monotone — the sample is a subset of
    what a larger n returns."""
    from udata_datalake_service_spark.operators.core import weighted_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "id long, w double"
    )
    pick = lambda k: {  # noqa: E731
        r["id"] for r in weighted_sample(df, k, F.col("w"), ["id"]).collect()
    }
    got = pick(n)
    n_pos = sum(1 for w in weights if w > 0)
    assert len(got) == min(n, n_pos)
    assert all(weights[i] > 0 for i in got)
    assert got == pick(n)
    assert got <= pick(min(n + 3, max(n_pos, 1)))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab c\tthe\nof x\x0b"),
            min_size=0,
            max_size=80,
        ),
        min_size=0,
        max_size=6,
    )
)
def test_ngram_kernel_agrees_with_reference(texts):
    """The batched factorize-chain n-gram kernel is a pure rewrite of the
    Counter reference — identical output on arbitrary whitespace-mangled
    batches (doc boundaries, empty docs, repeated grams, \x0b splits)."""
    from udata_datalake_service_spark.llm.gopher import (
        _ngram_stat_columns,
        _ngram_stat_columns_py,
    )

    assert _ngram_stat_columns(texts) == _ngram_stat_columns_py(texts)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=25),
        min_size=1,
        max_size=15,
    )
)
def test_paragraph_dedup_matches_python_reference(spark, token_lists):
    """For any corpus over a tiny alphabet (dense with genuine repeats),
    paragraph_dedup's keep set and reconstruction equal a direct Python
    replay of the global-first-occurrence rule."""
    from udata_datalake_service_spark.llm.corpus import paragraph_dedup

    P = 4  # para_tokens
    docs = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in paragraph_dedup(df, para_tokens=P).collect()}

    seen: set[str] = set()
    for i, toks in enumerate(token_lists):
        words = [f"w{t}" for t in toks]
        paras = [" ".join(words[j : j + P]) for j in range(0, len(words), P)]
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        assert got[i]["n_paras"] == len(paras), (i, token_lists)
        assert got[i]["n_kept"] == len(kept)
        assert got[i]["clean_text"] == " ".join(kept)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=15),
        min_size=1,
        max_size=12,
    )
)
def test_ngram_novelty_matches_python_reference(spark, token_lists):
    """Novelty counts equal a direct replay of the first-owner rule over
    distinct bigrams."""
    from udata_datalake_service_spark.llm.corpus import ngram_novelty

    docs = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df, k=2).collect()}

    owner: dict[tuple, int] = {}
    grams_per_doc: dict[int, set] = {}
    for i, toks in enumerate(token_lists):
        grams = {tuple(toks[j : j + 2]) for j in range(len(toks) - 1)}
        grams_per_doc[i] = grams
        for g in grams:
            owner.setdefault(g, i)
    for i in grams_per_doc:
        n_grams = len(grams_per_doc[i])
        n_novel = sum(1 for g in grams_per_doc[i] if owner[g] == i)
        assert got[i]["n_grams"] == n_grams
        assert got[i]["n_novel"] == n_novel
        if n_grams:
            assert abs(got[i]["novelty"] - round(n_novel / n_grams, 6)) < 1e-9
        else:
            assert got[i]["novelty"] == 0.0


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcdefgh"), st.integers(1, 9)),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=0, max_value=9),
)
def test_countmin_laws_property(spark, pairs, cut):
    """Hypothesis law for the count-min sketch on arbitrary weighted
    streams: (1) est >= exact for every inserted item, (2) splitting the
    stream anywhere and merging the two sketches equals the whole-stream
    sketch bucket-for-bucket — partitioning and arrival order can never
    change the sketch."""
    from udata_datalake_service_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
        countmin_merge,
    )

    rows = [(i, t, w) for i, (t, w) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i long, t string, w long")
    k = cut % (len(rows) + 1)
    whole = countmin_build(df, "t", depth=3, width=4, weight="w")
    merged = countmin_merge(
        countmin_build(df.filter(F.col("i") < k), "t", depth=3, width=4, weight="w"),
        countmin_build(df.filter(F.col("i") >= k), "t", depth=3, width=4, weight="w"),
    )
    as_map = lambda s: {(r["row"], r["bucket"]): r["c"] for r in s.collect()}  # noqa: E731
    assert as_map(whole) == as_map(merged)

    exact: dict = {}
    for t, w in pairs:
        exact[t] = exact.get(t, 0) + w
    est = {
        r["t"]: r["est"]
        for r in countmin_estimate(
            whole, df.select("t").distinct(), "t", depth=3, width=4
        ).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["A", "B", "C"]), st.text("xyz ", min_size=1, max_size=12)),
        min_size=3,
        max_size=15,
    ).filter(lambda rows: len({l for l, _ in rows}) >= 2),
    st.integers(min_value=1, max_value=8),
)
def test_nb_predictions_partition_invariant_property(spark, rows, nparts):
    """Hypothesis law for the NB classifier: the fixed-point scores make
    predictions and margins identical under ANY repartitioning of the
    training and scoring frames — float-sum order can never flip an
    argmax."""
    from udata_datalake_service_spark.llm.classify import nb_predict, nb_train

    train = spark.createDataFrame(rows, "lang string, text string")
    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id long, text string"
    )

    def run(tr, dc):
        model, priors = nb_train(tr, label="lang")
        return {
            r["doc_id"]: (r["pred"], r["score_q"], r["margin_q"])
            for r in nb_predict(dc, model, priors).collect()
        }

    a = run(train, docs)
    b = run(train.repartition(nparts), docs.repartition(max(1, 9 - nparts)))
    assert a == b


def test_binary_parsers_fail_typed_on_garbage(spark):
    """Fuzz pin (r8): corrupt or random bytes through every vendored
    binary parser raise ValueError / NotImplementedError ONLY — a raw
    IndexError / KeyError / zlib.error / struct.error out of an entropy
    decoder would kill executor tasks untyped on poisoned corpora (the
    decode ladder's fallback and WARC ingest both catch typed errors).
    Deterministic seed; ~2k trials per parser family."""
    import random

    from udata_datalake_service_spark.llm import bmp, exif, jpeg, png
    from udata_datalake_service_spark.sources import warc

    rng = random.Random(1234)
    enc = jpeg.encode_jpeg_gray(16, 8, bytes([100]) * 128)
    encp = jpeg.encode_jpeg_gray_progressive(16, 8, bytes([100]) * 128)
    parsers = [
        jpeg.decode_jpeg,
        jpeg.parse_jpeg_dimensions,
        exif.parse_exif,
        png.decode_png,
        bmp.decode_bmp,
        lambda b: list(warc.iter_warc_records(b)),
        warc.gunzip_members,
    ]
    for trial in range(2000):
        data = bytes(rng.randint(0, 255) for _ in range(rng.randint(0, 120)))
        if trial % 3 == 0:  # corrupted valid prefixes hit deeper branches
            base = enc if trial % 2 else encp
            data = base[: rng.randint(0, len(base))] + data
        for fn in parsers:
            try:
                fn(data)
            except (ValueError, NotImplementedError):
                pass  # the typed contract
