#!/usr/bin/env python
"""Generate the driver-attestation ledger: for every registered gate query,
the round of its LAST driver attestation (from CORRECTNESS_r*.json), the
round of its last IMPLEMENTATION change (git history of the files behind
it), and its position in the current `_PRIORITY` rotation.

The driver checks a bounded window (~50 queries) per round, so attestation
freshness is a managed resource; this ledger makes the freshness debt
visible in-repo instead of being reconstructed by each judge (VERDICT r5
next-round #8). A query is CODE-STALE when its implementation changed in a
round after its last attestation — the r6 rotation keyed only on
attestation age, so queries rewritten in the very round being attested
rotated OUT of the window (VERDICT r6 next-round #2); code-stale queries
now jump the queue. Output replaces the `## Attestation ledger` section of
COVERAGE.md (appends it if absent).

Usage: python tools/attestation_ledger.py [--check|--suggest]
  --check    exit 1 if COVERAGE.md is out of date instead of rewriting it.
  --suggest  print the recommended next-round `_PRIORITY` body
             (never-attested first, then code-stale, then oldest-attested,
             stable by current order) ready to paste into
             querylib/__init__.py.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "databricks_import_pyspark_scripts_spark"
MARKER = "## Attestation ledger"


def gather() -> tuple[list[str], dict[str, tuple[int, bool]]]:
    """Returns (priority-ordered names, {name: (last_round, passed)})."""
    sys.path.insert(0, REPO)
    from databricks_import_pyspark_scripts_spark.querylib import all_queries

    names = list(all_queries())
    hist: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            ok = bool(row.get("rows_match")) and row.get("err") is None and (
                row.get("hash_match") is not False)
            hist[name] = (rnd, ok)
    return names, hist


def _commit_rounds() -> tuple[dict[str, int], int]:
    """{commit_sha: round}, current_round. The driver ends round N with
    'round N: ...' commit(s) — a round may close with SEVERAL (r3 has an
    end-of-round snapshot AND the verdict commit), so the round number is
    parsed from the subject rather than counted. A boundary commit belongs
    to the round it closes; work after the last 'round N' boundary is
    round N+1. Uncommitted changes belong to the current round."""
    out = subprocess.run(
        ["git", "log", "--reverse", "--first-parent", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    rounds: dict[str, int] = {}
    rnd = 1
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+):", subject)
        if m:
            n = int(m.group(1))
            rounds[sha] = n
            rnd = max(rnd, n + 1)
        else:
            rounds[sha] = rnd
    return rounds, rnd


def _abs_module(base: str, pkg_dir: str) -> str:
    """Resolve a possibly-relative import base to an absolute module."""
    if not base.startswith("."):
        return base
    up = len(base) - len(base.lstrip("."))
    parts = pkg_dir.split(".")
    parts = parts[: len(parts) - (up - 1)] if up > 1 else parts
    tail = base.lstrip(".")
    return ".".join(parts + ([tail] if tail else []))


class DepTracer:
    """Object-level change tracking: the round in which a query's
    implementation last changed, following the actual call graph.

    Granularity matters for the rotation to be usable: file-level
    dependency rounds marked ~90 of 172 queries code-stale after a normal
    round (any touch to a shared operator module tainted every query in
    every importing file), which makes a 50-slot attestation window
    useless. This tracer instead resolves each imported NAME to its
    object and asks git for that object's own history:

    * functions/classes -> ``git log -L :name:file`` (the definition
      range only — appending new queries/operators to a module does not
      mark its existing ones stale), recursing into THEIR imports the
      same way (operators import each other shallowly, e.g.
      containment_pairs -> bucket_pairs);
    * module constants (MAX_BUCKET, CONTAIN_MAX_DF, ...) -> the
      assignment line's history (``-L /^NAME =/,+1:file``);
    * whole-module imports and unresolvable names -> the file's round
      (conservative fallback);
    * anything in a file with uncommitted changes -> the current round.

    Known boundary: names resolved DYNAMICALLY (getattr, dict dispatch)
    and oracle-SQL builders not named in the query function fall back to
    nothing — the per-round judge sweep remains the backstop for those.
    """

    MAX_DEPTH = 4
    # the registry module is rotation METADATA — `_PRIORITY` changes every
    # round and every query's decorator references `register`, so tracking
    # it would mark all 172 queries code-stale on every rotation edit
    INFRA = (f"{PKG}/querylib/__init__.py",)

    def __init__(self, rounds: dict[str, int], current: int):
        self.rounds = rounds
        self.current = current
        self._file_round: dict[str, int] = {}
        self._name_round: dict[tuple[str, str], int] = {}
        self._obj_round: dict[tuple[str, str], int] = {}
        self._toplevel: dict[str, dict[str, str]] = {}

    def _git_round(self, args: list[str]) -> int | None:
        res = subprocess.run(["git", *args], cwd=REPO,
                             capture_output=True, text=True)
        sha = res.stdout.strip().splitlines()[0] if res.stdout.strip() else ""
        if res.returncode != 0 or not sha:
            return None
        return self.rounds.get(sha, self.current)

    def file_round(self, rel: str) -> int:
        if rel not in self._file_round:
            dirty = subprocess.run(
                ["git", "status", "--porcelain", "--", rel], cwd=REPO,
                capture_output=True, text=True).stdout.strip()
            r = (self.current if dirty else
                 self._git_round(["log", "-1", "--first-parent",
                                  "--format=%H", "--", rel]))
            self._file_round[rel] = r if r is not None else self.current
        return self._file_round[rel]

    def name_round(self, rel: str, name: str) -> int:
        """Round of the last change to `name`'s definition in `rel`:
        funcname range first, assignment line second, file fallback."""
        key = (rel, name)
        if key not in self._name_round:
            if self.file_round(rel) == self.current and subprocess.run(
                    ["git", "status", "--porcelain", "--", rel], cwd=REPO,
                    capture_output=True, text=True).stdout.strip():
                self._name_round[key] = self.current
            else:
                r = self._git_round(
                    ["log", "-1", "--first-parent", "--format=%H", "-s",
                     "-L", f":{name}:{rel}"])
                if r is None:
                    r = self._git_round(
                        ["log", "-1", "--first-parent", "--format=%H", "-s",
                         "-L", f"/^{name} *=/,+1:{rel}"])
                self._name_round[key] = (r if r is not None
                                         else self.file_round(rel))
        return self._name_round[key]

    def _toplevel_name_map(self, rel: str) -> dict[str, str]:
        """{imported_name: absolute module} from a module's top-level
        package imports (single-line and parenthesized forms)."""
        if rel not in self._toplevel:
            with open(os.path.join(REPO, rel)) as f:
                src = f.read()
            pkg_dir = os.path.dirname(rel).replace("/", ".")
            nm: dict[str, str] = {}
            pat = (r"^from\s+((?:\.+|" + PKG + r")[\w.]*)\s+import\s+"
                   r"(?:\(([^)]*)\)|([\w, ]+))")
            for m in re.finditer(pat, src, re.MULTILINE):
                base = _abs_module(m.group(1), pkg_dir)
                for n in re.split(r"[,\s]+", m.group(2) or m.group(3) or ""):
                    if n:
                        nm[n] = base
            self._toplevel[rel] = nm
        return self._toplevel[rel]

    def _source_deps(self, src: str, rel: str) -> list[tuple[str, str]]:
        """(module, name) pairs the source references: function-local
        package imports, plus module-level-imported names it uses."""
        pkg_dir = os.path.dirname(rel).replace("/", ".")
        deps: list[tuple[str, str]] = []
        pat = (r"from\s+((?:\.+|" + PKG + r")[\w.]*)\s+import\s+"
               r"(?:\(([^)]*)\)|([\w, ]+))")
        for m in re.finditer(pat, src):
            base = _abs_module(m.group(1), pkg_dir)
            for n in re.split(r"[,\s]+", m.group(2) or m.group(3) or ""):
                if n:
                    deps.append((base, n))
        for nm, base in self._toplevel_name_map(rel).items():
            if re.search(rf"\b{re.escape(nm)}\b", src):
                deps.append((base, nm))
        return deps

    def dep_round(self, mod_name: str, attr: str,
                  depth: int = 0,
                  seen: set[tuple[str, str]] | None = None) -> int:
        """Round of the last change to `mod_name.attr` (recursive)."""
        import importlib
        import inspect

        seen = seen if seen is not None else set()
        key = (mod_name, attr)
        if key in self._obj_round:
            return self._obj_round[key]
        if key in seen:
            return 1  # cycle: the other path already counts it
        seen.add(key)
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            sub = f"{mod_name}.{attr}".replace(".", "/") + ".py"
            return self.file_round(sub) if os.path.exists(
                os.path.join(REPO, sub)) else 1
        val = getattr(mod, attr, None)
        if inspect.ismodule(val):
            rel = os.path.relpath(val.__file__, REPO)
            r = 1 if rel in self.INFRA else self.file_round(rel)
        elif (inspect.isfunction(val) or inspect.isclass(val)):
            try:
                rel = os.path.relpath(inspect.getsourcefile(val), REPO)
            except TypeError:
                rel = None
            if rel is None or not rel.startswith(PKG) or rel in self.INFRA:
                r = 1  # stdlib/3rd-party/registry-metadata: out of scope
            else:
                r = self.name_round(rel, val.__name__)
                if depth < self.MAX_DEPTH:
                    try:
                        src = inspect.getsource(val)
                    except OSError:
                        src = ""
                    for dm, dn in self._source_deps(src, rel):
                        r = max(r, self.dep_round(dm, dn, depth + 1, seen))
        else:
            # constant (or unresolvable): the assignment line's history in
            # the module that exports it
            rel = os.path.relpath(mod.__file__, REPO)
            r = (self.name_round(rel, attr)
                 if rel.startswith(PKG) and rel not in self.INFRA else 1)
        self._obj_round[key] = r
        return r


def code_rounds() -> tuple[dict[str, int], int]:
    """{query_name: round of last implementation change}, current_round.
    See ``DepTracer`` for the tracking model and its known boundaries."""
    rounds, current = _commit_rounds()
    sys.path.insert(0, REPO)
    import inspect

    from databricks_import_pyspark_scripts_spark.querylib import (
        REGISTRY,
        _load,
    )
    _load()
    tracer = DepTracer(rounds, current)
    out: dict[str, int] = {}
    module_src: dict[str, str] = {}
    for name, qd in REGISTRY.items():
        r = tracer.dep_round(qd.spark_fn.__module__, qd.spark_fn.__name__)
        # the oracle SQL is part of the attested pair; when it is built by
        # a named sibling helper (the `@register("x", _x_oracle(), ...)`
        # convention), that helper's history counts too
        rel = os.path.relpath(inspect.getsourcefile(qd.spark_fn), REPO)
        if rel not in module_src:
            with open(os.path.join(REPO, rel)) as f:
                module_src[rel] = f.read()
        m = re.search(r'@register\(\s*"' + re.escape(name)
                      + r'",\s*(\w+)\(', module_src[rel])
        if m:
            r = max(r, tracer.dep_round(qd.spark_fn.__module__, m.group(1)))
        out[name] = r
    return out, current


def render(names: list[str], hist: dict[str, tuple[int, bool]],
           changed: dict[str, int]) -> str:
    from collections import Counter

    counts = Counter(hist[n][0] if n in hist else 0 for n in names)
    summary = ", ".join(
        f"{'never' if rnd == 0 else f'r{rnd}'}: {c}"
        for rnd, c in sorted(counts.items()))
    stale = [n for n in names
             if changed.get(n, 0) > hist.get(n, (0, False))[0]]
    lines = [
        MARKER,
        "",
        "Round of each gate query's last driver attestation "
        "(`CORRECTNESS_r*.json`) and last implementation change (git "
        "history of the query's source files), in current `_PRIORITY` "
        "order — the driver window (~50/round) attests from the top. "
        "CODE-STALE = implementation changed after the last attestation; "
        "`--suggest` front-loads these. Regenerate with "
        "`python tools/attestation_ledger.py`.",
        "",
        f"Freshness summary — {summary} (of {len(names)} registered); "
        f"{len(stale)} code-stale.",
        "",
        "| # | query | last attested | code changed | result |",
        "|---|---|---|---|---|",
    ]
    for i, n in enumerate(names):
        ch = f"r{changed[n]}" if n in changed else "?"
        if n in hist:
            rnd, ok = hist[n]
            mark = " **CODE-STALE**" if changed.get(n, 0) > rnd else ""
            lines.append(f"| {i} | {n} | r{rnd} | {ch}{mark} | "
                         f"{'pass' if ok else 'FAIL'} |")
        else:
            lines.append(f"| {i} | {n} | never | {ch} | — |")
    return "\n".join(lines) + "\n"


def main() -> int:
    names, hist = gather()
    changed, current = code_rounds()
    if "--suggest" in sys.argv:
        # never-attested first (ZERO evidence beats invalid evidence —
        # a brand-new query must not queue behind a backlog of code-stale
        # ones), then CODE-STALE (their attestations describe old code —
        # in an optimization round the starved-first ordering left 30
        # just-rewritten gates driver-unattested, VERDICT r14 #1/#3, so
        # stale now outranks starved), then STARVED (last attestation >=
        # STARVE_AGE rounds old — the guard that keeps the r1-era TPC-H
        # tail from queueing forever, VERDICT r7 next-round #2; the stale
        # tier cannot refill indefinitely because each attestation clears
        # it), then oldest-attested; stable by current order
        STARVE_AGE = 5

        def key(i: int):
            n = names[i]
            att = hist.get(n, (0,))[0]
            stale = changed.get(n, 0) > att and att > 0
            starved = att > 0 and current - att >= STARVE_AGE
            tier = 0 if att == 0 else (1 if stale else (2 if starved else 3))
            return (tier, att, i)
        try:
            for i in sorted(range(len(names)), key=key):
                print(f'    "{names[i]}",')
        except BrokenPipeError:  # piped through head — not an error
            pass
        return 0
    section = render(names, hist, changed)
    cov_path = os.path.join(REPO, "COVERAGE.md")
    with open(cov_path) as f:
        cov = f.read()
    if MARKER in cov:
        head = cov.split(MARKER)[0]
        new = head + section
    else:
        new = cov.rstrip("\n") + "\n\n" + section
    if "--check" in sys.argv:
        if new != cov:
            print("COVERAGE.md attestation ledger is stale — regenerate")
            return 1
        print("ledger up to date")
        return 0
    with open(cov_path, "w") as f:
        f.write(new)
    print(f"wrote ledger: {len(names)} queries, "
          f"{sum(1 for n in names if n not in hist)} never attested, "
          f"{sum(1 for n in names if changed.get(n, 0) > hist.get(n, (0,))[0] and n in hist)} code-stale")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
