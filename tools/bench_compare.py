"""Calib-normalized cross-round bench comparison (r07 verdict item 6).

Usage: python tools/bench_compare.py BENCH_r07.json BENCH_r08.json [-n 10]

Raw per-query seconds are NOT comparable across rounds — each round runs
on a fresh VM and BENCH_DRIFT.md measured a uniform 1.23× host shift on
identical code+data. bench.py therefore emits a ``calib`` anchor
(jvm_codegen / jvm_shuffle micro-benchmarks); this tool divides every
query's seconds by its round's ``calib.jvm_codegen`` before comparing,
so the printed ``calib_ratio`` is host-shift-free and drift triage is
one command instead of a hand audit.

Accepts either a raw bench stdout line or the driver's BENCH_r{N}.json
wrapper — including the wrapper's known capture quirk where ``parsed``
is null and ``tail`` truncates the HEAD of the JSON line (the queries
map and calib block survive at the end; they are recovered by balanced-
brace extraction).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def _iter_json_objects(text: str):
    """Yield every parseable top-level ``{...}`` object found in a text
    blob (the driver tail holds the truncated full line followed by the
    compact line; scanning balanced braces finds the complete one)."""
    i = 0
    while True:
        i = text.find("{", i)
        if i < 0:
            return
        depth = 0
        end = None
        for j in range(i, len(text)):
            if text[j] == "{":
                depth += 1
            elif text[j] == "}":
                depth -= 1
                if depth == 0:
                    end = j
                    break
        if end is None:
            # unbalanced to EOF: step past this brace, try the next one
            i += 1
            continue
        try:
            obj = json.loads(text[i : end + 1])
            if isinstance(obj, dict):
                yield obj
        except json.JSONDecodeError:
            pass
        i += 1


def _extract_object(text: str, key: str) -> dict | None:
    """Balanced-brace JSON object extraction for ``"key": {...}`` from a
    possibly head-truncated (and possibly escaped) JSON fragment."""
    for needle in (f'"{key}": {{', f'\\"{key}\\": {{'):
        i = text.find(needle)
        if i < 0:
            continue
        start = text.index("{", i)
        depth = 0
        for j in range(start, len(text)):
            if text[j] == "{":
                depth += 1
            elif text[j] == "}":
                depth -= 1
                if depth == 0:
                    frag = text[start : j + 1]
                    if "\\" in needle:
                        frag = frag.replace('\\"', '"')
                    try:
                        return json.loads(frag)
                    except json.JSONDecodeError:
                        return None
    return None


def _hash_to_name(hl: int) -> dict[str, str]:
    """sha1-prefix → query name over every name the current repo's
    registry (plus bench HEADLINE) knows. Names are append-only across
    rounds, so a LATER repo can always invert an EARLIER round's
    hashes; unknown hashes stay as raw keys (still cross-round
    comparable — the hash is a pure function of the name)."""
    import hashlib
    import os
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in _sys.path:
        _sys.path.insert(0, root)
    names: set[str] = set()
    try:
        from youtube_scraper_db_spark.registry import REGISTRY

        names |= {s.name for s in REGISTRY}
    except Exception:  # noqa: BLE001 — artifact-only usage still works
        pass
    try:
        from bench import HEADLINE

        names |= set(HEADLINE)
    except Exception:  # noqa: BLE001
        pass
    # Prefix collisions: a future name colliding at a historical hl
    # prefix must NOT silently overwrite the mapping (it would mislabel
    # an old artifact's timings) — leave colliding hashes unmapped so
    # they surface as raw keys instead of a wrong name.
    inv: dict[str, str] = {}
    collided: set[str] = set()
    for n in names:
        h = hashlib.sha1(n.encode()).hexdigest()[:hl]
        if h in inv and inv[h] != n:
            collided.add(h)
        else:
            inv[h] = n
    for h in collided:
        del inv[h]
    return inv


def _decode_compact(doc: dict) -> tuple[dict, dict] | None:
    """Decode bench.py's compact second line ({"bv":1,"hl":..,"qcs":..}
    or the decisecond fallback "qds") → (queries name→sec, calib)."""
    scale, qmap = None, None
    if isinstance(doc.get("qcs"), dict):
        scale, qmap = 100.0, doc["qcs"]
    elif isinstance(doc.get("qds"), dict):
        scale, qmap = 10.0, doc["qds"]
    if qmap is None:
        return None
    inv = _hash_to_name(int(doc.get("hl", 5)))
    queries = {inv.get(h, h): v / scale for h, v in qmap.items()}
    calib = {k: v / 1000.0 for k, v in (doc.get("calms") or {}).items()}
    return queries, calib


def load_bench(path: str) -> tuple[dict, dict]:
    """→ (queries: name→sec, calib: dict). Prefers bench.py's compact
    second line (complete map, survives the driver's 2000-char tail);
    falls back to the full line, the driver wrapper with ``parsed``,
    and the truncated-tail recovery quirks."""
    raw = open(path).read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = None
    candidates = []
    if isinstance(doc, dict):
        candidates.append(doc)
        if isinstance(doc.get("parsed"), dict):
            candidates.append(doc["parsed"])
    # compact line first: it is the only form guaranteed COMPLETE once
    # the full line outgrew the driver's tail.
    for c in candidates:
        got = _decode_compact(c)
        if got:
            return got
    text_for_compact = (
        doc.get("tail", raw) if isinstance(doc, dict) else raw
    )
    for m in _iter_json_objects(text_for_compact):
        got = _decode_compact(m)
        if got:
            return got
    for c in candidates:
        if isinstance(c.get("queries"), dict):
            return c["queries"], c.get("calib") or {}
    # tail recovery (parsed: null wrapper)
    text = doc.get("tail", raw) if isinstance(doc, dict) else raw
    queries = _extract_object(text, "queries")
    calib = _extract_object(text, "calib") or {}
    if not queries:
        queries = _scrape_query_pairs(text)
        if queries:
            print(
                f"NOTE: {path}: queries map recovered by pair-scrape "
                f"({len(queries)} entries; the tail truncated the map's "
                "head, so the earliest queries of the run are missing)",
                file=sys.stderr,
            )
    if not queries:
        sys.exit(f"could not recover a queries map from {path}")
    return queries, calib


#: bench-line keys that hold numbers but are not per-query timings
_NON_QUERY_KEYS = {"metric", "value", "n", "rc", "cpus", "sf"}


def _scrape_query_pairs(text: str) -> dict[str, float]:
    """Recover ``name: seconds`` pairs from a tail that truncated the
    HEAD of the queries map (the ``"queries": {`` needle itself is gone
    — the r09-verdict finding). The bench line is
    ``{..., "queries": {...}, "sf": ..., "calib": {...}}``, so
    everything before ``}, "sf"`` (or ``}, "calib"``) is queries-map
    territory; scrape ``"name": float`` pairs there. A name cut
    mid-identifier by the tail boundary loses its opening quote, so the
    quoted-name regex simply never captures it — no drop-first
    heuristic is needed (one would wrongly discard a complete first
    pair whenever the cut lands exactly on a pair boundary)."""
    import re

    stop = len(text)
    for marker in ('}, "sf"', '}, "calib"', '},"sf"', '},"calib"'):
        i = text.find(marker)
        if i >= 0:
            stop = min(stop, i)
    region = text[:stop]
    pairs = re.findall(
        r'"([A-Za-z_][A-Za-z0-9_]*)"\s*:\s*([0-9]+(?:\.[0-9]+)?)', region
    )
    return {k: float(v) for k, v in pairs if k not in _NON_QUERY_KEYS}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "-n", type=int, default=10, help="rows to print per direction"
    )
    ap.add_argument(
        "--anchor", default="jvm_codegen", help="calib key to normalize by"
    )
    args = ap.parse_args()

    qa, ca = load_bench(args.old)
    qb, cb = load_bench(args.new)
    anch_a = float(ca.get(args.anchor) or 0) or None
    anch_b = float(cb.get(args.anchor) or 0) or None
    if anch_a is None or anch_b is None:
        print(
            f"WARNING: calib.{args.anchor} missing "
            f"({args.old}: {anch_a}, {args.new}: {anch_b}) — "
            "calib_ratio falls back to raw",
            file=sys.stderr,
        )

    shared = sorted(set(qa) & set(qb))
    added = sorted(set(qb) - set(qa))
    removed = sorted(set(qa) - set(qb))

    rows = []
    for name in shared:
        a, b = float(qa[name]), float(qb[name])
        raw_ratio = b / a if a else float("inf")
        if anch_a and anch_b:
            calib_ratio = (b / anch_b) / (a / anch_a) if a else float("inf")
        else:
            calib_ratio = raw_ratio
        rows.append((name, a, b, raw_ratio, calib_ratio))

    host = (anch_b / anch_a) if (anch_a and anch_b) else None

    print(f"# bench compare: {args.old} -> {args.new}")
    print(
        f"shared {len(shared)} | added {len(added)} | removed {len(removed)}"
    )
    if host:
        print(
            f"host anchor {args.anchor}: {anch_a:.3f}s -> {anch_b:.3f}s "
            f"(host shift x{host:.3f} — divided out of calib_ratio)"
        )
    if rows:
        med_raw = statistics.median(r[3] for r in rows)
        med_cal = statistics.median(r[4] for r in rows)
        tot_a = sum(r[1] for r in rows)
        tot_b = sum(r[2] for r in rows)
        print(
            f"shared totals: {tot_a:.1f}s -> {tot_b:.1f}s | "
            f"median raw x{med_raw:.3f} | median calib x{med_cal:.3f}"
        )
    else:
        print("no shared queries — skipping ratio table")
    if rows:
        hdr = f"{'query':<34}{'old_s':>8}{'new_s':>8}{'raw':>8}{'calib':>8}"
        print("\nslowest-moving (calib_ratio desc):")
        print(hdr)
        for name, a, b, rr, cr in sorted(rows, key=lambda r: -r[4])[: args.n]:
            print(f"{name:<34}{a:>8.2f}{b:>8.2f}{rr:>8.2f}{cr:>8.2f}")
        print("\nfastest-moving (calib_ratio asc):")
        print(hdr)
        for name, a, b, rr, cr in sorted(rows, key=lambda r: r[4])[: args.n]:
            print(f"{name:<34}{a:>8.2f}{b:>8.2f}{rr:>8.2f}{cr:>8.2f}")
    if added:
        cost = sum(float(qb[n]) for n in added)
        print(f"\nadded ({cost:.1f}s): {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")


if __name__ == "__main__":
    main()
