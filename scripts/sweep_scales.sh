#!/bin/sh
# Tri-scale parity sweep: run the full oracle-parity suite at every
# shipped scale factor. The sf0.01 run is the driver-shaped gate; the
# sf0.001 and sf0.1 runs catch the two off-scale bug classes round 3
# measured in the wild: vacuous-empty results (fixed thresholds/scopes
# that empty out as data scales) and float-rounding divergences that
# only trip at larger row counts. ~25 min total on local[32].
set -e
for sf in sf0.001 sf0.01 sf0.1; do
  echo "=== PARITY_SF_DIR=/root/testdata/$sf ==="
  PARITY_SF_DIR=/root/testdata/$sf python -m pytest tests/test_parity.py -q
done
