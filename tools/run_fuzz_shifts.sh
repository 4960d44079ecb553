#!/bin/bash
# Runs the reference-parity suite across a range of FREDDIE_PARITY_SEED shifts.
for s in $(seq ${1:-84} ${2:-110}); do
  echo "=== shift $s ==="
  FREDDIE_PARITY_SEED=$s timeout 900 python -m pytest tests/test_reference_parity.py -q 2>&1 | tail -2
done
echo "FUZZ SWEEP DONE"
