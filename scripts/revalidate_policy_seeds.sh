#!/bin/bash
# Round-5: re-validate shipped training-policy gates at 3 seeds
# (round-4 verdict item #3 — apply the multi-seed lesson backwards).
# Policies under test:
#   - EDSR device-config dtype (bfloat16)  -> validate_learning --bf16 A/B
#   - zoo learning deltas (+dB vs bicubic) -> validate_zoo_learning
#   - SRFBN plain-bf16 SISR policy         -> validate_zoo_learning srfbn --dtype bf16
#   - MoE-vs-dense competitiveness         -> validate_moe_learning
# Output: one log per run under /tmp/policy_seeds/; grep RESULT for the table.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/policy_seeds
for seed in 0 1 2; do
  for dt in "" "--bf16"; do
    tag=$( [ -z "$dt" ] && echo f32 || echo bf16 )
    echo "== validate_learning seed=$seed $tag =="
    timeout 1800 python scripts/validate_learning.py --seed "$seed" $dt \
      > "/tmp/policy_seeds/edsr_${tag}_s${seed}.log" 2>&1 || echo "FAIL edsr $tag $seed"
  done
done
for seed in 0 1 2; do
  echo "== validate_moe_learning seed=$seed =="
  timeout 2400 python scripts/validate_moe_learning.py --seed "$seed" \
    > "/tmp/policy_seeds/moe_s${seed}.log" 2>&1 || echo "FAIL moe $seed"
done
for seed in 0 1 2; do
  echo "== validate_zoo_learning seed=$seed f32 =="
  timeout 5400 python scripts/validate_zoo_learning.py --seed "$seed" \
    > "/tmp/policy_seeds/zoo_f32_s${seed}.log" 2>&1 || echo "FAIL zoo f32 $seed"
  echo "== validate_zoo_learning srfbn seed=$seed bf16 =="
  timeout 1800 python scripts/validate_zoo_learning.py srfbn --seed "$seed" --dtype bf16 \
    > "/tmp/policy_seeds/srfbn_bf16_s${seed}.log" 2>&1 || echo "FAIL srfbn bf16 $seed"
done
grep -h RESULT /tmp/policy_seeds/*.log | sort
echo DONE
