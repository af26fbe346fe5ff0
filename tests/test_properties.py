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
    for t in ("int", "float"):
        got = _cast_all(spark, texts, t)
        numericish = [v for v, s in zip(got, texts) if v is not None]
        # anything that did come through must have digits in its source
        for v, s in zip(got, texts):
            if v is not None:
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
