#!/usr/bin/env python3
"""Scale-curve gate: automatic quadratic-tail detector.

Compares two bench_full.json records taken at a small and a large scale
factor (a ~10x row step) and flags any query whose floor-subtracted time
grows super-linearly — the failure class that produced round-1's
shingle-count banding fix, caught mechanically instead of by eye.

Usage:
  python3 tools/scale_curve.py <bench_small.json> <bench_big.json> \
      [growth_threshold=12] [min_marginal_big_sec=0.25] [outcounts.json]

outcounts.json (optional, from graft.PairCountProbe) maps query name ->
[small_output_rows, big_output_rows]; a would-be flag whose time growth
does not exceed its OUTPUT growth moves to "output_bound" with both
numbers (a pair query over a fixture with replicated near-dup families
produces quadratically more true pairs by construction).

Model: every Spark query pays a roughly constant scheduler/job floor
(estimated here as the MINIMUM query time within each record) that has
nothing to do with data volume; growth is measured on the marginal time
above that floor. A query is flagged only when BOTH
  - marginal_big / marginal_small > growth_threshold  (10x rows allows
    slack for shuffles and log factors before 12x), AND
  - marginal_big > min_marginal_big_sec  (sub-quarter-second marginal
    work cannot be a scale problem; it is floor noise amplified by a
    tiny denominator).
Prints a JSON report; exit code 1 iff anything is flagged.
"""
import json
import sys


def times(path):
    rec = json.load(open(path))
    return {k: v for k, v in rec.items()
            if not k.startswith("_") and isinstance(v, (int, float)) and v >= 0}


def main(small_path, big_path, threshold=12.0, min_marginal=0.25,
         outcounts_path=None):
    small, big = times(small_path), times(big_path)
    # Optional output-row counts {query: [small_rows, big_rows]} (produced
    # by graft.PairCountProbe): a pair-producing query whose OUTPUT grows
    # super-linearly because the fixture replicates near-dup families
    # (FixtureGen copies=k makes ~C(k,2) true pairs per family) is doing
    # the work it was asked, not blowing up — normalize its time growth by
    # output growth before flagging. Queries absent from the file are
    # judged raw, so a genuine all-pairs bug (candidate work WITHOUT output
    # growth) still flags.
    # malformed outcounts must be a loud exit-2 diagnostic (like an empty
    # record), never a traceback and never a silent excusal with garbage
    # denominators; per-entry garbage downgrades that query to raw
    # judgement (the safe direction) and is listed in the report
    outcounts, bad_outcounts = {}, []
    if outcounts_path:
        try:
            raw_oc = json.load(open(outcounts_path))
            if not isinstance(raw_oc, dict):
                raise ValueError("outcounts root is not an object")
        except (OSError, ValueError) as e:
            print(json.dumps({"error": f"malformed outcounts file: {e}",
                              "outcounts": outcounts_path}))
            return 2
        for k, v in raw_oc.items():
            if k.startswith("_"):
                outcounts[k] = v  # _meta provenance
            elif (isinstance(v, list) and len(v) == 2
                    and all(isinstance(x, (int, float)) for x in v)):
                outcounts[k] = v
            else:
                bad_outcounts.append(k)
    if not small or not big:
        # a record with zero eligible entries (all -1 sentinels, or a
        # meta-only/empty file) is malformed input, not a scale flag:
        # report it explicitly and exit 2 so a CI gate can tell the two
        # apart instead of seeing an unhandled ValueError traceback
        print(json.dumps({"error": "no eligible query entries",
                          "small_record": small_path, "big_record": big_path,
                          "n_small": len(small), "n_big": len(big)}))
        return 2
    floor_s, floor_b = min(small.values()), min(big.values())
    growth, flagged, output_bound = {}, [], {}
    for name in sorted(set(small) & set(big)):
        adj_s = max(small[name] - floor_s, 0.005)  # clamp: floor-level query
        adj_b = max(big[name] - floor_b, 0.005)
        r = adj_b / adj_s
        growth[name] = round(r, 2)
        if r > threshold and adj_b > min_marginal:
            oc = outcounts.get(name)
            if oc and oc[0] > 0 and oc[1] > 0:
                out_growth = oc[1] / oc[0]
                r_norm = r / out_growth
                # excused ONLY when time grew no faster than the answer
                # itself (r <= out_growth, i.e. r_norm <= 1): a pair query
                # emitting 219x the rows may take up to 219x the time; a
                # super-linear-per-output-row regression still flags.
                if r <= out_growth:
                    output_bound[name] = {
                        "time_growth": round(r, 2),
                        "rows_small": oc[0], "rows_big": oc[1],
                        "output_growth": round(out_growth, 2),
                        "normalized_growth": round(r_norm, 3)}
                    continue
            flagged.append(name)
    # a query that completed small but recorded the -1 failure sentinel (or
    # vanished) at the big scale IS the worst scale regression — it stopped
    # completing. times() drops sentinels, so re-read the raw records and
    # flag the asymmetry explicitly rather than silently not comparing it.
    raw_small = json.load(open(small_path))
    raw_big = json.load(open(big_path))
    died_at_big = sorted(
        name for name in small
        if not name.startswith("_")
        and (raw_big.get(name, None) is None or raw_big.get(name) < 0))
    failed_small = sorted(
        name for name, v in raw_small.items()
        if not name.startswith("_") and isinstance(v, (int, float)) and v < 0)
    flagged = sorted(set(flagged) | set(died_at_big))
    report = {
        "small_record": small_path, "big_record": big_path,
        "floor_small_sec": round(floor_s, 3), "floor_big_sec": round(floor_b, 3),
        "growth_threshold": threshold, "min_marginal_big_sec": min_marginal,
        "flagged": flagged,
        "output_bound": output_bound,
        # provenance: which fixtures/run produced the output-count
        # denominators (PairCountProbe embeds them as "_meta") — a stale
        # outcounts file generated from different fixtures would silently
        # excuse flags with wrong denominators otherwise
        "outcounts_meta": outcounts.get("_meta") if outcounts_path else None,
        "outcounts_malformed": sorted(bad_outcounts),
        "died_at_big": died_at_big,
        "failed_at_small": failed_small,
        "top_growth": dict(sorted(growth.items(), key=lambda kv: -kv[1])[:15]),
        "n_compared": len(growth),
        # shared-box context recorded by Bench alongside each record: a
        # flag produced under heavy outside load carries its explanation
        "env": {
            which: {k: rec.get("_" + k) for k in
                    ("load_before", "load_after", "load_peak_1m",
                     "cpu_steal_pct") if "_" + k in rec}
            for which, rec in (("small", raw_small), ("big", raw_big))
        },
    }
    print(json.dumps(report, indent=1))
    return 1 if flagged else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sys.exit(main(args[0], args[1],
                  float(args[2]) if len(args) > 2 else 12.0,
                  float(args[3]) if len(args) > 3 else 0.25,
                  args[4] if len(args) > 4 else None))
