"""Round-5 qualification of `adj_dtype=bfloat16` for TRAINING (VERDICT r4
item 8): the single-pass bf16 adjacency-product mode carries a 3.7e-2
worst-grad relative error class (HWVALID_r4.json), big enough to plausibly
move training — so it needs an empirical accuracy clearance, not just a
kernel-parity row.

Protocol: the round-4 matched-budget band, identically configured
(hidden-150 selu BN-free, Adam 1e-3 flat, 150 epochs, batch=32 merged,
Acc-max early stop uf=10 mf=20 — BASELINE.md "Round 4: the 5-SEED
matched-budget band") with ADJ_DTYPE=bfloat16, split seeds 3/5/7/11/13.
The f32 comparison column is the recorded gnn_tpu band (mean 0.7663).

Run on the chip:  PYTHONUNBUFFERED=1 python benchmarks/bf16adj_band.py
Env: SEEDS="3,5,7,11,13"  OUT=BF16ADJ_r5.json
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
SEEDS = [int(s) for s in os.environ.get("SEEDS", "3,5,7,11,13").split(",")]
OUT = os.environ.get("OUT", os.path.join(HERE, "..", "BF16ADJ_r5.json"))

F32_BAND = {3: 0.7647, 5: 0.7866, 7: 0.7566, 11: 0.7739, 13: 0.7497}

runs = []
for seed in SEEDS:
    env = dict(os.environ,
               PYTHONUNBUFFERED="1",
               EPOCHS="150", COSINE="0", DROPOUT="0",
               SPLIT_SEED=str(seed), ADJ_DTYPE="bfloat16")
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable,
                        os.path.join(HERE, "mutag_single.py")],
                       env=env, capture_output=True, text=True, timeout=1800)
    tail = [ln for ln in p.stdout.splitlines() if "TEST=" in ln]
    print(f"seed {seed}: rc={p.returncode} "
          f"wall={time.perf_counter() - t0:.0f}s "
          f"{tail[-1] if tail else '(no TEST line)'}", flush=True)
    if p.returncode != 0 or not tail:
        print(p.stdout[-2000:], file=sys.stderr)
        print(p.stderr[-2000:], file=sys.stderr)
        runs.append({"split_seed": seed, "failed": True})
        continue
    test = json.loads(tail[-1].split("TEST=", 1)[1])
    runs.append({"split_seed": seed, "acc": test.get("Acc"),
                 "bacc": test.get("Bacc"), "fs": test.get("Fs"),
                 "f32_acc": F32_BAND.get(seed),
                 "wall_s": round(time.perf_counter() - t0)})

accs = [r["acc"] for r in runs if not r.get("failed")]
summary = {
    "date": time.strftime("%Y-%m-%d"),
    "mode": "adj_dtype=bfloat16 (single-pass bf16 adjacency products)",
    "protocol": ("matched-budget band: mutag_single.py EPOCHS=150 COSINE=0 "
                 "DROPOUT=0, split seeds " + ",".join(map(str, SEEDS))),
    "runs": runs,
    "mean_acc": round(sum(accs) / len(accs), 4) if accs else None,
    "f32_mean_acc": 0.7663,
    "tf_reference_mean_acc": 0.7629,
}
print(json.dumps(summary), flush=True)
with open(OUT, "w") as f:
    json.dump(summary, f, indent=1)
