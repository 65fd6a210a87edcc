#!/bin/bash
# CA-env high-throughput tuning sweep — RESOLVED. Finding (see
# docs/PERFORMANCE.md "CA-env quality at throughput"): the fused configs
# match-or-beat the update-dense regime once given a matching optimizer
# budget, and are far more seed-reliable. Winner below: 1024 envs,
# gradient-steps 64 fused by 4 (16 sequential optimizer steps of batch
# 1024 per 8192-step round), 96M env steps at 1.76M env-steps/s incl.
# updates — 81 +/- 6% arrivals over 6 seeds (best 91.1% / 8.9%
# collisions), vs the dense 64-env regime's 27-93% across seeds at its
# 4M-step budget (0.29M steps/s). Budget is the dominant knob (32M runs
# plateau at 64-75%); fusion depth k<=8 is a mild second (k8: 87.9%);
# doubling update density (g128) or linear lr decay both hurt.
#
# One TPU process at a time (sequential). Each run ends with an
# arrival/collision eval of the exported bundle (16 envs x 5000 steps).
set -u
cd "$(dirname "$0")/.."
STEPS=${STEPS:-96e6}

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  python -m usv_tpu.train.run_sac --env usv-asmc-ca-v0 \
    --total-steps "$STEPS" --buffer-size 400000 --light-checkpoints \
    --checkpoint-every-blocks 0 --logdir "runs/ca_sweep/$name" "$@" \
    2>&1 | tail -20
  python -m usv_tpu.train.run_eval --env usv-asmc-ca-v0 \
    --policy "runs/ca_sweep/$name/policy" --out "runs/ca_sweep/$name/eval" \
    --steps 5000 --episodes 16 2>&1 | tail -3
}

# Winning recipe (91.1% arrivals at 1.76M steps/s)
run best_1024e_g64k4_96M --num-envs 1024 --train-freq 8 --gradient-steps 64 \
  --update-fusion 4 --lr 3e-4 --rounds-per-block 1172 --eval-every-blocks 2
echo "=== sweep done ==="
