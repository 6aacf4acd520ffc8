#!/bin/bash
# Render golden reference images for the regression gate
# (tests/test_golden.py) with the locally-built reference binaries
# (scripts/build_reference.sh) and copy them into data/golden/.
#
# Scenes + spp follow the reference regression suite configs
# (regression/<test>/args) at a reduced resolution so the goldens stay
# small in-repo; the RMSE gates come from regression/<test>/maxerror.
set -e
DST=${DST:-/tmp/corona-ref}
OUT=${OUT:-/root/repo/data/golden}
W=${W:-256}
H=${H:-160}
mkdir -p "$OUT"
cd "$DST"

render() { # test spp
  local T=$1 SPP=$2
  if [ -f "$OUT/${T}.pfm" ]; then echo "$T: cached"; return; fi
  ./corona-"$T" "regression/$T/test.nra2" -s "$SPP" -w "$W" -h "$H" -x golden \
    > /dev/null 2>&1
  cp "regression/$T/testgolden_fb00.pfm" "$OUT/${T}.pfm"
  echo "$T: rendered ${SPP}spp ${W}x${H}"
}

render 0010_pt    2048
render 0011_ptdl  2048
render 0012_lt    2048
render 0014_bdpt  1024
