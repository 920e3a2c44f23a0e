#!/usr/bin/env python3
"""Min-merge several Bench artifacts of the SAME query set and slice into
one: per-query minimum wall across runs (each input is already min-of-N;
more attempts = more N), per-query telemetry (task_sec / shuffle_bytes /
stages / stage_top) taken from the attempt that owned THAT query's winning
wall — so attribution always describes the run being reported. Use when
repeated attempts bracket environment noise — the steady-state minimum is
the number that scales, and single-window smears (see the round-8 verdict)
otherwise masquerade as regressions.

Round-over-round drift attribution (round-10 verdict item 4): pass
  --prev <artifact.json> [block]
where artifact is last round's raw bench line OR a BENCH_full document
(block selects "sf0.1" / "sf1_10x_slice"; default sf0.1). Queries whose
wall moved >30% AND >0.2 s get a "drift_vs_prev" entry comparing wall
against task seconds and shuffle bytes, with a per-stage task-sec diff
(stages matched by role signature: task count, then closest shuffle-write
bytes) when both sides carry stage_top. Verdict "environment-smear" is
thereby a measured claim — wall moved while compute and plan telemetry
did not — and "compute-changed" names the stage that moved.

Usage: merge_bench_min.py <out.json> <bench1.json> [bench2.json ...]
                          [--prev <prev.json> [block]]
Attempts with per-query errors contribute only their error-free queries.
"""
import json
import sys


def bench(path):
    line = open(path).read()
    return json.loads(line[line.index('{'):])


def load_prev(path, block=None):
    d = json.load(open(path))
    if "queries_spark_s" not in d and "queries" not in d:
        d = d.get(block or "sf0.1", {})
    if "queries_spark_s" in d:  # a BENCH_full block
        return {"queries": d["queries_spark_s"],
                "task_sec": d.get("task_sec", {}),
                "shuffle_bytes": d.get("shuffle_bytes", {}),
                "stages": d.get("stages", {}),
                "stage_top": d.get("stage_top", {})}
    return {"queries": d["queries"], "task_sec": d.get("task_sec", {}),
            "shuffle_bytes": d.get("shuffle_bytes", {}),
            "stages": d.get("stages", {}), "stage_top": d.get("stage_top", {})}


def stage_diff(prev_top, now_top):
    """Match stages by role signature — task count first, then closest
    shuffle-write bytes — and report per-stage task-sec deltas."""
    if not prev_top or not now_top:
        return None
    unmatched = list(prev_top)
    out = []
    for s in now_top:
        cands = [p for p in unmatched if p.get("tasks") == s.get("tasks")] or unmatched
        p = min(cands, key=lambda c: abs(c.get("w_bytes", 0) - s.get("w_bytes", 0)))
        unmatched.remove(p)
        out.append({"tasks": s.get("tasks"), "w_bytes_now": s.get("w_bytes"),
                    "w_bytes_prev": p.get("w_bytes"),
                    "sec_now": s.get("sec"), "sec_prev": p.get("sec"),
                    "sec_delta": round(s.get("sec", 0.0) - p.get("sec", 0.0), 3)})
    return out


def main(argv):
    prev = None
    if "--prev" in argv:
        i = argv.index("--prev")
        tail = argv[i + 1:]
        prev = load_prev(tail[0], tail[1] if len(tail) > 1 else None)
        argv = argv[:i]
    out, paths = argv[0], argv[1:]
    docs = [bench(p) for p in paths]
    base = min(docs, key=lambda d: d["value"])
    queries = {}
    runs = {}
    owner = {}  # query -> doc owning its winning wall
    for d in docs:
        errs = d.get("errors", {})
        for k, v in d["queries"].items():
            if k in errs:
                continue
            runs.setdefault(k, []).extend(d.get("runs", {}).get(k, [v]))
            if k not in queries or v < queries[k]:
                queries[k] = v
                owner[k] = d
    if not queries:
        sys.exit("merge_bench_min: every attempt errored on every query — "
                 "refusing to write a hollow artifact")
    merged = dict(base)
    merged["queries"] = queries
    merged["runs"] = runs
    merged["value"] = sum(queries.values())
    merged["errors"] = {}
    merged["runs_per_query"] = max((len(v) for v in runs.values()), default=0)
    merged["merged_from_attempts"] = len(paths)
    # per-query telemetry from the winning attempt (not the best-total one)
    for field in ("task_sec", "shuffle_bytes", "stages", "stage_top"):
        merged[field] = {k: owner[k].get(field, {}).get(k)
                         for k in queries if owner[k].get(field, {}).get(k) is not None}

    if prev is not None:
        drift = {}
        for k, now_w in queries.items():
            prev_w = prev["queries"].get(k)
            if not prev_w or prev_w <= 0:
                continue
            rel = now_w / prev_w
            if not (abs(now_w - prev_w) > 0.2 and (rel > 1.3 or rel < 1 / 1.3)):
                continue
            t_now = merged["task_sec"].get(k)
            t_prev = prev["task_sec"].get(k)
            s_now = merged["shuffle_bytes"].get(k)
            s_prev = prev["shuffle_bytes"].get(k)
            task_rel = (t_now / t_prev) if t_now and t_prev else None
            shuf_rel = (s_now / s_prev) if s_now and s_prev else None
            compute_flat = (task_rel is not None and 0.8 <= task_rel <= 1.25 and
                            (shuf_rel is None or 0.85 <= shuf_rel <= 1.15))
            drift[k] = {
                "wall_prev_s": prev_w, "wall_now_s": now_w,
                "wall_rel": round(rel, 3),
                "task_sec_prev": t_prev, "task_sec_now": t_now,
                "task_rel": round(task_rel, 3) if task_rel else None,
                "shuffle_prev": s_prev, "shuffle_now": s_now,
                "stages_prev": prev["stages"].get(k),
                "stages_now": merged["stages"].get(k),
                "stage_diff": stage_diff(prev["stage_top"].get(k),
                                         merged["stage_top"].get(k)),
                "verdict": ("environment-smear (wall moved, compute+plan "
                            "telemetry flat)") if compute_flat
                           else "compute-changed (see task_rel/stage_diff)"
                           if task_rel is not None else
                           "unattributed (prev artifact carries no task_sec)",
            }
        merged["drift_vs_prev"] = drift
        if drift:
            print(f"drift vs prev ({len(drift)} queries >30% and >0.2s):")
            for k, d in sorted(drift.items()):
                print(f"  {k}: {d['wall_prev_s']:.2f} -> {d['wall_now_s']:.2f}s"
                      f" task_rel={d['task_rel']} -> {d['verdict']}")
    json.dump(merged, open(out, "w"))
    print(f"merged {len(paths)} attempts -> {out}: "
          f"total {merged['value']:.2f}s over {len(queries)} queries")


if __name__ == "__main__":
    main(sys.argv[1:])
