"""Property-based tests (SURVEY §5: rebuild test strategy) — hypothesis
generates adversarial field values; a Python re-implementation of the
wire contract is the independent oracle for the columnar parsers, and
set identities check the hash/shingle layer.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import Row

from spark_stream_analyzer_spark.operators import dedup
from spark_stream_analyzer_spark.sources.wire import parse_kill_lines

# CSV fields: no commas (the wire format has no quoting); printable ascii
FIELD = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters=","),
    max_size=8,
)
WORD = st.text(alphabet="abcdefg", min_size=1, max_size=4)


def expected_kill_fanout(killer: str, victim: str, assister: str) -> int:
    n = 0
    if killer != "":
        n += 1
    if victim != "":
        n += 1
    if assister != "" and assister != "0":
        n += 1
    return n


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 99), FIELD, FIELD, FIELD),
        min_size=1,
        max_size=8,
    )
)
def test_kill_parser_fanout_and_fields(spark, lines):
    rows, expected = [], 0
    for tick, rnd, killer, victim, assister in lines:
        cols = ["x"] * 13
        cols[1], cols[2] = str(tick), str(rnd)
        cols[3], cols[4] = killer, "K_ID"
        cols[7], cols[8] = victim, "V_ID"
        cols[11], cols[12] = assister, "A_ID"
        rows.append(Row(value=",".join(cols)))
        expected += expected_kill_fanout(killer, victim, assister)
    out = parse_kill_lines(spark.createDataFrame(rows)).collect()
    assert len(out) == expected
    for ev in out:
        assert ev.type in ("kill", "death", "assist")
        assert ev.steam_id in ("K_ID", "V_ID", "A_ID")
        # integer-division second: floor(tick/128) stays in the tick range
        assert 0 <= ev.second and ev.second * 128 <= 10**6
        assert 0 <= ev.round <= 99


@settings(max_examples=8, deadline=None)
@given(st.lists(WORD, min_size=0, max_size=12))
def test_minhash_identity_and_shingle_bounds(spark, words):
    """jaccard(x, x) = 1 via identical signatures; shingle count ≤ n-k+1."""
    text = " ".join(words)
    df = spark.createDataFrame(
        [Row(doc_id=0, text=text, lang="en", source="t", n_chars=len(text)),
         Row(doc_id=1, text=text, lang="en", source="t", n_chars=len(text))]
    )
    sig = dedup.minhash_signatures(df)
    rows = {r.doc_id: r for r in sig.collect()}
    assert [rows[0][f"mh{j}"] for j in range(16)] == [rows[1][f"mh{j}"] for j in range(16)]
    n_sh = rows[0].asDict()["sh"]
    assert len(n_sh) <= max(0, len(words) - 2)  # ≤ n-k+1 with k=3 (distinct may shrink)
