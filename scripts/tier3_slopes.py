#!/usr/bin/env python
"""Tier-3 scaling leg: 640k -> 5.12M docs (AMPLIFY 128 -> 1024) and
8.19M -> 65.5M vectors (EMB_AMPLIFY 4096 -> 32768).

Extends the tier-2 slope matrix (``bench.py --slopes``, artifact
``BENCH/tier2_slopes.json``) one more x8 tier for every stage whose
tier-3 cost is tractable on one box. The LO leg is NOT re-run: the
tier-2 artifact's ``tier2_sec`` (AMPLIFY=128, measured in <=5-stage
batches on an idle socket) is reused verbatim as this run's lo times,
and ``slope = (t3 / t2) / 8`` exactly as in the tier-2 protocol.

Protocol notes carried over from ``report_slopes``:
- fresh JVM per batch, <=5 stages per batch (the r5 session-9
  measurement-hygiene finding: long shared-JVM legs accumulate GC
  pressure that inflates later stages several-fold);
- untimed warmup + best-of-1 steady-state per stage
  (SPARK_GRAFT_BENCH_REPEATS=1, same as --slopes);
- the 5.12M-doc corpus is staged ONCE via SPARK_GRAFT_SHARED_STAGE and
  read by every batch.

Deliberately excluded stages, each with the reason on record:
- canonicalize: the amplification confound proven in the tier-2 section
  (AMPLIFY grows duplicate MULTIPLICITY, LSH pairs per group are
  C(m,2) by problem definition — multiplicity 1024 means ~524k pairs
  per group x 5000 groups). canonicalize_wide, the constant-multiplicity
  control that models the realistic web shape, IS run at tier 3.
- graph_scc: the giant-SCC worst case runs ~diameter rounds over all
  nodes (211 s at tier 2, ~30+ min at tier 3); its slope is already
  measured and named at tier 2 (0.94, near-linear).
- ann_brute_topk: the O(N*Q) oracle the IVF/SQ8 serving paths exist to
  avoid (~13 min at 65.5M vectors); IVF and SQ8 are run instead, with
  recall guards intact.
- canonicalize_hot / canonicalize_incr3: skew/variance studies, not
  scaling stages.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
AMPLIFY_HI = int(os.environ.get("SPARK_GRAFT_TIER3_AMPLIFY", "1024"))
EMB_HI = int(os.environ.get("SPARK_GRAFT_TIER3_EMB", "32768"))
FACTOR = 8
STAGE_ROOT = os.environ.get(
    "SPARK_GRAFT_TIER3_STAGE", "/tmp/kg-tier3-stage"
)

BATCHES = [
    ["extract_text", "kg_triples", "quality_score", "mention_detect",
     "link_extract"],
    ["structured_extract", "warc_ingest", "triple_store", "materialize",
     "wat_export"],
    ["minhash_dedup", "boilerplate", "text_index", "kg_entailment",
     "sparql_query"],
    ["host_rollup", "domain_rollup", "frontier_sched", "entity_linking",
     "graph_pagerank"],
    ["graph_closure", "graph_walks", "graph_bfs"],
    ["graph_hits", "graph_trustrank", "graph_spam_mass"],
    ["canonicalize_wide", "canonicalize_incr"],
    ["ann_index_build", "ann_ivf_topk", "ann_sq8_topk"],
]


def run(cmd_env: dict, args: list) -> dict:
    env = dict(os.environ, **{k: str(v) for k, v in cmd_env.items()})
    proc = subprocess.run(
        [sys.executable, BENCH] + args,
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench rc={proc.returncode} args={args}:\n"
            + proc.stderr[-3000:]
        )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    base_env = {
        "SPARK_GRAFT_AMPLIFY": AMPLIFY_HI,
        "SPARK_GRAFT_EMB_AMPLIFY": EMB_HI,
        "SPARK_GRAFT_BENCH_REPEATS": "1",
        "SPARK_GRAFT_SHARED_STAGE": STAGE_ROOT,
    }
    # SPARK_GRAFT_TIER3_BATCHES="a,b;c" overrides the default batch
    # matrix (semicolon-separated batches of comma-separated stages) —
    # the re-measure/resume mode, mirroring SPARK_GRAFT_TIER2_STAGES.
    batches = BATCHES
    env_b = os.environ.get("SPARK_GRAFT_TIER3_BATCHES")
    if env_b:
        batches = [
            [s.strip() for s in b.split(",") if s.strip()]
            for b in env_b.split(";") if b.strip()
        ]
    os.makedirs(STAGE_ROOT, exist_ok=True)
    staged = run(base_env, ["--stage-corpus"])
    print(json.dumps({"staged": staged}), flush=True)

    t3, extras, failed = {}, {}, []
    for batch in batches:
        try:
            out = run(
                dict(base_env, SPARK_GRAFT_BENCH_ONLY=",".join(batch)), []
            )
        except RuntimeError as exc:
            failed.append({"batch": batch, "err": str(exc)[-500:]})
            print(json.dumps({"batch_failed": batch}), flush=True)
            continue
        stress = out.get("stress", {})
        for k in batch:
            v = stress.get(k, out.get("queries", {}).get(k))
            if isinstance(v, (int, float)):
                t3[k] = v
        extras.update(
            {
                k: v
                for k, v in stress.items()
                if not isinstance(v, (int, float)) or k not in batch
            }
        )
        print(json.dumps({"batch": batch, "sec": {k: t3.get(k) for k in batch}}),
              flush=True)

    with open(os.path.join(REPO, "BENCH", "tier2_slopes.json")) as fh:
        tier2 = json.load(fh)
    lo = tier2["tier2_sec"]
    # merge into a prior tier-3 artifact (stages measured now win) so
    # partial re-measure runs refine instead of clobber
    art_path = os.path.join(REPO, "BENCH", "tier3_slopes.json")
    if os.path.exists(art_path):
        with open(art_path) as fh:
            prior = json.load(fh)
        t3 = {**prior.get("tier3_sec", {}), **t3}
        extras = {**prior.get("tier3_extras", {}), **extras}
    slopes = {
        k: round((t3[k] / lo[k]) / FACTOR, 3)
        for k in t3 if k in lo and lo[k] > 0
    }
    artifact = {
        "metric": "tier3_scaling_slopes",
        "value": round(sum(slopes.values()) / len(slopes), 3)
        if slopes else None,
        "unit": "slope (1.0 = linear in rows)",
        "factor": FACTOR,
        "docs_lo": tier2.get("docs_hi"),
        "docs_hi": tier2.get("docs_hi", 0) * FACTOR,
        "emb_lo": 4096 * 2000,
        "emb_hi": EMB_HI * 2000,
        "tier2_sec": {k: lo[k] for k in t3 if k in lo},
        "tier3_sec": t3,
        "slopes": slopes,
        "tier3_extras": extras,
        "failed": failed,
        "sf": tier2.get("sf"),
    }
    print(json.dumps(artifact), flush=True)
    with open(art_path, "w") as fh:
        json.dump(artifact, fh, indent=1)


if __name__ == "__main__":
    main()
