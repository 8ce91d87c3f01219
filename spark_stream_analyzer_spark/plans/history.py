"""Driver-sample history + staleness: the computed _DRIVER_PRIORITY order.

The grading driver snapshots only the FIRST ~50 rows of ``queries()``
iteration order into ``CORRECTNESS_r{N}.json`` each round.  Rounds 6-11
hand-curated that head under a standing rule ("new + changed-code rows
first, then rotate the oldest greens"); the r11 verdict asked for the
rule to be COMPUTED so the last discipline-based correctness guarantee
becomes structural.  This module derives the full priority order from
two public inputs:

1. **CORRECTNESS_r*.json** (driver artifacts at the repo root) → each
   row's *last green round* (green = no error, rows + schema match, and
   the value hash did not mismatch).
2. **git** → which package source files changed since each round's
   artifact commit (``round {N}: verdict/...``), hence which rows are
   *stale after edit*: their builder's module — or anything that module
   transitively imports from the package — changed after their last
   green driver check.

Priority order = tier 0 (never green: new rows, never-sampled rows, and
rows whose LATEST sample was red — an old green never outranks a newer
red) by name, then the stale-after-edit tier — rows edited THIS round
first, then earlier-edited rows — oldest green first within each, then
the fresh tier oldest-green-first.  Everything degrades gracefully: no
artifacts → registration order is kept; no git (driver env without a
checkout, shallow clone) → rotation without the staleness signal.

Excluded from the staleness file map: this module and ``registry.py``
itself — every plan module imports the registry, so counting the
ordering plumbing would flag all ~250 rows whenever the priority
bookkeeping changes, which says nothing about query semantics.
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
from functools import lru_cache

_PKG = "spark_stream_analyzer_spark"

#: ordering-plumbing files that never affect query semantics (see module
#: docstring); repo-relative.
_PLUMBING = frozenset(
    {
        f"{_PKG}/plans/registry.py",
        f"{_PKG}/plans/history.py",
    }
)

#: the driver's per-round sample size (head of queries() order).
SAMPLE_WINDOW = 50


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _is_green(rec: dict) -> bool:
    """One driver row is green iff it errored nowhere and nothing that
    was compared mismatched (``hash_match`` may be absent/None for
    rows-only checks — only an explicit False is a mismatch)."""
    return (
        rec.get("err") is None
        and rec.get("rows_match") is True
        and rec.get("schema_match") is True
        and rec.get("hash_match") is not False
    )


@lru_cache(maxsize=None)
def _sample_history(root: str | None = None) -> tuple:
    """(last_green, last_sampled): name → latest green round / latest
    sampled-at-all round, from every CORRECTNESS artifact."""
    root = root or repo_root()
    greens: dict[str, int] = {}
    sampled: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            recs = json.load(open(f))
        except (OSError, ValueError):
            continue
        for name, rec in recs.items():
            if not isinstance(rec, dict):
                continue
            sampled[name] = max(sampled.get(name, 0), rnd)
            if _is_green(rec):
                greens[name] = max(greens.get(name, 0), rnd)
    return greens, sampled


def last_green_round(root: str | None = None) -> dict:
    """name → latest round with a green driver row (absent = never green).

    A row whose LATEST sample was red (an older green exists but the most
    recent driver check failed) is dropped from the map entirely: it must
    re-enter tier 0 with the never-green rows, not ride its stale green
    through the rotation queue."""
    greens, sampled = _sample_history(root)
    return {
        name: rnd for name, rnd in greens.items() if sampled.get(name, 0) <= rnd
    }


def _git(root: str, *args: str) -> str | None:
    try:
        p = subprocess.run(
            ["git", "-C", root, *args],
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.SubprocessError):
        return None
    return p.stdout if p.returncode == 0 else None


@lru_cache(maxsize=None)
def round_commits(root: str | None = None) -> dict:
    """round number → that round's driver artifact commit sha."""
    root = root or repo_root()
    log = _git(root, "log", "--format=%H %s")
    if log is None:
        return {}
    out: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subj)
        if m:
            # first hit wins: git log is newest-first and a re-recorded
            # round would supersede the older commit
            out.setdefault(int(m.group(1)), sha)
    return out


@lru_cache(maxsize=None)
def changed_package_files_since(commit: str, root: str | None = None) -> frozenset:
    """Repo-relative package .py files that differ between ``commit`` and
    the WORKING TREE (one-arg diff: uncommitted edits count — a row whose
    code was just edited is stale immediately, not after the commit).
    None-able inputs return the empty set (graceful no-git degrade)."""
    root = root or repo_root()
    diff = _git(root, "diff", "--name-only", commit, "--", _PKG)
    if diff is None:
        return frozenset()
    return frozenset(
        f for f in diff.splitlines() if f.endswith(".py") and f not in _PLUMBING
    )


def _module_name_to_relpath(dotted: str, root: str) -> str | None:
    """``spark_stream_analyzer_spark.operators.dedup`` → its repo-relative
    .py path, or None when the dotted name is not a module (a function
    imported FROM a module) or the file does not exist."""
    rel = dotted.replace(".", "/") + ".py"
    if os.path.exists(os.path.join(root, rel)):
        return rel
    init = dotted.replace(".", "/") + "/__init__.py"
    if os.path.exists(os.path.join(root, init)):
        return init
    return None


@lru_cache(maxsize=None)
def _direct_imports(relpath: str, root: str) -> frozenset:
    """Package modules imported by one source file (repo-relative paths)."""
    try:
        tree = ast.parse(open(os.path.join(root, relpath)).read())
    except (OSError, SyntaxError):
        return frozenset()
    dotted: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            dotted.update(a.name for a in node.names if a.name.startswith(_PKG))
        elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(_PKG):
            dotted.add(node.module)
            # `from pkg.operators import dedup` names submodules, not
            # just symbols — resolve each name as a candidate module
            dotted.update(f"{node.module}.{a.name}" for a in node.names)
    out = set()
    for d in dotted:
        rel = _module_name_to_relpath(d, root)
        if rel is not None and rel not in _PLUMBING:
            out.add(rel)
    return frozenset(out)


@lru_cache(maxsize=None)
def module_file_closure(relpath: str, root: str | None = None) -> frozenset:
    """The source files a module transitively lives in: itself plus every
    package module reachable through its import graph (plumbing excluded).
    This is the file set whose edits make the module's registry rows
    stale."""
    root = root or repo_root()
    seen: set[str] = set()
    frontier = [relpath]
    while frontier:
        f = frontier.pop()
        if f in seen or f in _PLUMBING:
            continue
        seen.add(f)
        frontier.extend(_direct_imports(f, root) - seen)
    return frozenset(seen)


def builder_relpath(build_fn, root: str | None = None) -> str | None:
    """Repo-relative source file of a registered builder function."""
    root = root or repo_root()
    code = getattr(build_fn, "__code__", None)
    if code is None:
        return None
    path = os.path.abspath(code.co_filename)
    root = os.path.abspath(root)
    if not path.startswith(root + os.sep):
        return None
    return os.path.relpath(path, root).replace(os.sep, "/")


def stale_rows(
    builders: dict,
    root: str | None = None,
    greens: dict | None = None,
    commits: dict | None = None,
    changed_since=None,
) -> set:
    """Rows whose transitive source files changed AFTER their last green
    driver round — the stale-after-edit set that must re-enter the
    driver-sample head.  ``greens``/``commits``/``changed_since`` are
    injectable for tests; production derives them from artifacts + git.
    Rows with no green at all are not "stale" (they are tier-0 never-green
    and lead the order anyway)."""
    root = root or repo_root()
    greens = last_green_round(root) if greens is None else greens
    commits = round_commits(root) if commits is None else commits
    if changed_since is None:
        changed_since = lambda c: changed_package_files_since(c, root)  # noqa: E731
    out: set[str] = set()
    for name, fn in builders.items():
        rnd = greens.get(name)
        if rnd is None or rnd not in commits:
            continue
        changed = changed_since(commits[rnd])
        if not changed:
            continue
        rel = builder_relpath(fn, root)
        if rel is None:
            continue
        if module_file_closure(rel, root) & changed:
            out.add(name)
    return out


def recent_stale_rows(
    builders: dict,
    root: str | None = None,
    commits: dict | None = None,
    changed_since=None,
) -> set:
    """Rows whose transitive source files changed since the LATEST round's
    artifact commit — i.e. edited THIS round (committed or not).  These
    keep the historic hand rule's place at the front of the stale tier:
    the freshest edits are the likeliest to carry new bugs, and they must
    not wait behind the rotation queue for a driver row."""
    root = root or repo_root()
    commits = round_commits(root) if commits is None else commits
    if not commits:
        return set()
    head_commit = commits[max(commits)]
    if changed_since is None:
        changed_since = lambda c: changed_package_files_since(c, root)  # noqa: E731
    changed = changed_since(head_commit)
    if not changed:
        return set()
    out: set[str] = set()
    for name, fn in builders.items():
        rel = builder_relpath(fn, root)
        if rel is not None and module_file_closure(rel, root) & changed:
            out.add(name)
    return out


def degradation_path(root: str | None = None) -> str:
    """Which inputs the computed order actually had (ADVICE r12): the
    locally-certified order is only guaranteed to match the grading
    driver's when both see the same artifacts + git history.  Snapshot
    this beside the order (tools/snapshot_sampling_order.py →
    SAMPLING_ORDER.json, committed each round) so a divergent driver
    environment (shallow clone truncating 'round N: verdict' commits,
    missing artifacts) is detectable from the artifact diff instead of
    silently reordering the head."""
    root = root or repo_root()
    if not last_green_round(root):
        return "no-artifacts"
    if not round_commits(root):
        return "no-git"
    return "full"


def priority_order(
    builders: dict,
    root: str | None = None,
    greens: dict | None = None,
    stale: set | None = None,
    recent: set | None = None,
) -> tuple:
    """The canonical driver-sample order over ``builders``' keys.

    tier 0:  never green (new rows, never-sampled rows, red-last-sample
             rows) — by name;
    tier 1a: stale AND edited this round — oldest green first, then name;
    tier 1b: stale after an earlier edit — oldest green first, then name;
    tier 2:  fresh — oldest green first, then name.

    When the stale set exceeds the driver's ~50-row sample window (plan
    files are monolithic, so a wide edit marks most rows stale) the order
    degrades to sampling the LONGEST-UNVERIFIED rows first and draining
    the rest over subsequent rounds — nothing can ride on an outdated
    green indefinitely.  A permutation of the input keys; with no
    artifacts at all the input (registration) order is kept unchanged.
    """
    root = root or repo_root()
    greens = last_green_round(root) if greens is None else greens
    if not greens:
        return tuple(builders)
    stale = stale_rows(builders, root, greens=greens) if stale is None else stale
    recent = recent_stale_rows(builders, root) if recent is None else recent

    def key(name: str):
        g = greens.get(name)
        if g is None:
            return (0, 0, name)
        if name in stale:
            return ((1 if name in recent else 2), g, name)
        return (3, g, name)

    return tuple(sorted(builders, key=key))
