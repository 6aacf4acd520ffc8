#!/bin/bash
# Build the reference corona-13 renderer out-of-tree (gcc, headless) so
# golden images for the regression gate (tests/test_golden.py) can be
# produced locally.  The reference tree is read-only; we copy to /tmp.
#
# Usage: scripts/build_reference.sh [dst] [test ...]
#   dst   build dir (default /tmp/corona-ref)
#   test  regression test dirs to build a binary for (per-test config.mk
#         selects the sampler at compile time); each binary is kept as
#         $dst/corona-<test>.  Default: 0010_pt.
set -e
REF=/root/reference
DST=${1:-/tmp/corona-ref}
shift || true
TESTS=${@:-0010_pt}

if [ ! -d "$DST" ]; then
  cp -r "$REF" "$DST"
  chmod -R u+w "$DST"
fi
cd "$DST"

# toolchain: this host has gcc/g++ but no clang/X11/libomp
cat > arch <<'EOF'
all: corona modules
CC=gcc
CXX=g++
CFLAGS+=-march=native -msse2 -mfpmath=sse -O3 -ffast-math -fno-finite-math-only -g
CXXFLAGS+=-march=native -msse2 -mfpmath=sse -O3 -ffast-math -fno-finite-math-only -g
EOF
sed -i -e 's/^CXX=clang++/CXX=g++/' -e 's/^CC=clang/CC=gcc/' \
       -e 's/ -lomp *$//' tools/img/Makefile
mkdir -p .git && touch .git/FETCH_HEAD

for T in $TESTS; do
  if [ -x "corona-$T" ]; then echo "corona-$T: cached"; continue; fi
  cp "regression/$T/config.mk" config.mk
  # headless: no X11 on this machine
  sed -i -e 's/^MOD_display=.*/MOD_display=null/' config.mk
  grep -q 'MOD_display' config.mk || echo 'MOD_display=null' >> config.mk
  sed -i -e 's/^LDFLAGS+=-lX11/#&/' config.mk
  # older per-test configs predate some module vars; supply defaults
  cat >> config.mk <<'EOF'
MOD_lights?=list
MOD_filter?=blackmanharris
MOD_pointsampler?=halton
MOD_points?=sfmt
MUTATIONS?=
COL_input?=ergb
COL_output?=srgb
COL_camera?=xyz
CFLAGS+=-DCAMERA_LENS=\"$(CAMERA_LENS)\"
EOF
  make clean >/dev/null 2>&1 || true
  make -j"$(nproc)" corona modules > "buildlog-$T" 2>&1
  cp corona "corona-$T"
  echo "corona-$T: built"
done
