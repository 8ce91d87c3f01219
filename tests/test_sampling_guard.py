"""Structural guards for the computed driver-sample priority (r11 verdict
task #1/#2): the ~50-row CORRECTNESS sample head must be COMPUTED from the
driver's own artifacts + git staleness, never hand-curated, so that

* never-green rows (new / never-sampled / red-last-sample) always lead,
* rows whose code changed after their last green driver row re-enter the
  head (freshest edits first, then longest-unverified first when the
  stale set overflows the window), and
* remaining slots rotate oldest-green-first.

No SparkSession needed — these are pure-metadata tests.
"""

from __future__ import annotations

import pathlib

from spark_stream_analyzer_spark.plans import history as H
from spark_stream_analyzer_spark.plans import registry

ROOT = str(pathlib.Path(__file__).resolve().parents[1])


def _builders():
    registry._load_all()
    return {name: spec.build for name, spec in registry.QUERIES.items()}


def _tier_key(name, greens, stale, recent):
    """The canonical urgency key (mirrors history.priority_order)."""
    g = greens.get(name)
    if g is None:
        return (0, 0, name)
    if name in stale:
        return ((1 if name in recent else 2), g, name)
    return (3, g, name)


def _head_violations(order, greens, stale, recent, window=H.SAMPLE_WINDOW):
    """Rows more urgent than some head member yet left OUTSIDE the head —
    the exact failure mode the r10/r11 verdicts flagged (a touched or
    never-sampled row aging out of the driver sample).  Empty iff the
    head is the true top-``window`` of the canonical urgency order."""
    head = list(order[:window])
    tail = list(order[window:])
    if not tail:
        return []
    worst_in_head = max(_tier_key(n, greens, stale, recent)[:2] for n in head)
    return [
        n
        for n in tail
        if _tier_key(n, greens, stale, recent)[:2] < worst_in_head
    ]


def test_priority_is_a_permutation_of_the_registry():
    b = _builders()
    order = registry._DRIVER_PRIORITY
    assert sorted(order) == sorted(b)
    # and queries() iterates in exactly that order — the driver samples
    # the head of THIS iteration, nothing else
    assert list(registry.queries()) == list(order)


def test_registry_order_matches_history_canonical_order():
    """registry._load_all must apply history.priority_order verbatim —
    a wiring regression (e.g. reordering lost in a refactor) would
    silently return registration order and starve the rotation."""
    b = _builders()
    assert registry._DRIVER_PRIORITY == H.priority_order(b, ROOT)


def test_changed_and_never_green_rows_reenter_driver_priority_head():
    """THE r11 verdict task: derive each row's last-green round from the
    CORRECTNESS history, its source files from the builder's transitive
    package imports, staleness from `git diff <last-green artifact
    commit>` — and assert no stale/never-green row sits outside the
    50-row head while a LESS urgent row occupies a head slot.  When the
    stale set exceeds the window (monolithic plan files make wide edits
    mark most rows stale) the head must hold the most urgent ``window``
    rows; the rest drain over subsequent rounds by construction."""
    b = _builders()
    greens = H.last_green_round(ROOT)
    if not greens:  # fresh checkout without driver artifacts
        return
    stale = H.stale_rows(b, ROOT, greens=greens)
    recent = H.recent_stale_rows(b, ROOT)
    order = registry._DRIVER_PRIORITY
    bad = _head_violations(order, greens, stale, recent)
    assert not bad, (
        f"{len(bad)} rows more urgent than the head's least-urgent member "
        f"sit outside the {H.SAMPLE_WINDOW}-row driver sample: {bad[:10]}"
    )
    # and when everything urgent FITS, it must all be inside
    urgent = {n for n in b if greens.get(n) is None or n in stale}
    if len(urgent) <= H.SAMPLE_WINDOW:
        outside = urgent - set(order[: H.SAMPLE_WINDOW])
        assert not outside, f"urgent rows left out of a non-full head: {outside}"


def test_never_green_rows_lead_everything():
    b = _builders()
    greens = H.last_green_round(ROOT)
    if not greens:
        return
    order = registry._DRIVER_PRIORITY
    never = [n for n in order if n not in greens]
    assert list(order[: len(never)]) == sorted(never)


def test_stale_rows_detects_planted_operator_edit():
    """Deliberate-mutation proof (pure, no git): plant a fake change to
    operators/similarity.py — a file the `similarity_hard_negatives`
    builder only reaches TRANSITIVELY through its plan module's imports —
    and assert the row is flagged stale; with an empty diff it must not
    be."""
    b = _builders()
    row = "similarity_hard_negatives"
    greens = {row: 5}
    commits = {5: "fake-r5-sha", 11: "fake-r11-sha"}
    planted = frozenset({"spark_stream_analyzer_spark/operators/similarity.py"})

    got = H.stale_rows(
        {row: b[row]}, ROOT, greens=greens, commits=commits,
        changed_since=lambda c: planted,
    )
    assert got == {row}
    got = H.stale_rows(
        {row: b[row]}, ROOT, greens=greens, commits=commits,
        changed_since=lambda c: frozenset(),
    )
    assert got == set()
    # an edit to an unrelated operator must NOT flag the row
    got = H.stale_rows(
        {row: b[row]}, ROOT, greens=greens, commits=commits,
        changed_since=lambda c: frozenset(
            {"spark_stream_analyzer_spark/streaming/control_http.py"}
        ),
    )
    assert got == set()


def test_head_violation_checker_catches_planted_exclusion():
    """The guard itself must FAIL when a stale row is left out of the head
    in favor of a fresh one — proven by tampering with the computed order
    (swap the most urgent head row with the least urgent tail row) and
    asserting the checker reports it."""
    b = _builders()
    greens = H.last_green_round(ROOT)
    if not greens:
        return
    stale = H.stale_rows(b, ROOT, greens=greens)
    recent = H.recent_stale_rows(b, ROOT)
    order = list(registry._DRIVER_PRIORITY)
    if len(order) <= H.SAMPLE_WINDOW:
        return
    tampered = order[:]
    tampered[0], tampered[-1] = tampered[-1], tampered[0]
    # tamper only matters if the swapped rows differ in urgency
    k0 = _tier_key(order[0], greens, stale, recent)[:2]
    kl = _tier_key(order[-1], greens, stale, recent)[:2]
    if k0 == kl:
        return
    assert _head_violations(tampered, greens, stale, recent), (
        "planted head exclusion went undetected — the guard is vacuous"
    )


def test_red_after_green_drops_row_from_the_green_map(tmp_path):
    """A row green in r5 but RED in its latest (r9) sample must come back
    as never-green (tier 0) — an old green never outranks a newer red."""
    import json

    ok = {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}
    red = {"err": None, "rows_match": True, "schema_match": True, "hash_match": False}
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"rowA": ok, "rowB": ok})
    )
    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps({"rowA": red, "rowB": ok})
    )
    greens = H.last_green_round(str(tmp_path))
    assert "rowA" not in greens  # red at its latest sample → tier 0
    assert greens["rowB"] == 9


def test_priority_order_pure_fixture_tiers():
    """Tier semantics on a synthetic fixture: never-green < recent-stale
    < old-stale < fresh; oldest green first within each stale/fresh tier."""

    def fn():  # builder stand-in; file mapping unused (stale injected)
        return None

    builders = {n: fn for n in ["new", "recent11", "stale2", "stale3", "fresh2", "fresh9"]}
    greens = {"recent11": 11, "stale2": 2, "stale3": 3, "fresh2": 2, "fresh9": 9}
    order = H.priority_order(
        builders, ROOT, greens=greens,
        stale={"recent11", "stale2", "stale3"}, recent={"recent11"},
    )
    assert order == ("new", "recent11", "stale2", "stale3", "fresh2", "fresh9")


def test_priority_order_properties_on_random_histories():
    """Hypothesis-style sweep without Spark: random green/stale/recent
    assignments must always yield a permutation whose tiers are ordered
    (never-green < recent-stale < old-stale < fresh) and whose last-green
    rounds are monotone within each tier."""
    import random

    def fn():
        return None

    rng = random.Random(0xD12)
    for _ in range(200):
        names = [f"q{i}" for i in range(rng.randint(1, 40))]
        greens = {n: rng.randint(1, 11) for n in names if rng.random() < 0.8}
        stale = {n for n in greens if rng.random() < 0.5}
        recent = {n for n in stale if rng.random() < 0.5}
        order = H.priority_order(
            {n: fn for n in names}, ROOT, greens=greens, stale=stale, recent=recent
        )
        assert sorted(order) == sorted(names)

        def tier(n):
            if n not in greens:
                return 0
            if n in stale:
                return 1 if n in recent else 2
            return 3

        tiers = [tier(n) for n in order]
        assert tiers == sorted(tiers), (order, tiers)
        for t in (1, 2, 3):
            rounds = [greens[n] for n in order if tier(n) == t]
            assert rounds == sorted(rounds)
