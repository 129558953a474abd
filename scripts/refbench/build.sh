#!/bin/sh
# Build the headless reference benchmark against the read-only reference
# sources at /root/reference/LSD (nothing is copied into this repo).
# Output: build/refbench/lsd_refbench
set -e
REF=${REF:-/root/reference/LSD}
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "$HERE/../.." && pwd)
OUT=$REPO/build/refbench
EIGEN=${EIGEN:-/opt/venv/lib/python3.12/site-packages/tensorflow/include}
mkdir -p "$OUT/shim"
# Windows-only headers pulled in by the reference's threadpool.h; empty
# shims are enough on Linux (the POSIX pthread path is used throughout).
: > "$OUT/shim/io.h"
: > "$OUT/shim/process.h"

# threadpool.c is C; the MSVC "#pragma comment" line in its header is
# ignored by g++ with a warning.
g++ -O2 -w -std=c++14 -o "$OUT/lsd_refbench" \
    -I"$REF" -I"$OUT/shim" -I"$EIGEN" \
    -I/usr/include/opencv4 -I/usr/include/opencv4/opencv2 \
    "$HERE/main_bench.cpp" \
    "$REF/baseFunc.cpp" "$REF/myLSD.cpp" "$REF/myRDP.cpp" \
    "$REF/myFA.cpp" -x c "$REF/threadpool.c" \
    -lopencv_core -lopencv_imgproc -lpthread
echo "built $OUT/lsd_refbench"

# per-seed LSD trace driver (parity_trace.py)
g++ -O2 -w -std=c++14 -o "$OUT/lsd_trace" \
    -I"$REF" -I"$OUT/shim" -I"$EIGEN" \
    -I/usr/include/opencv4 -I/usr/include/opencv4/opencv2 \
    "$HERE/trace_lsd.cpp" "$REF/baseFunc.cpp" "$REF/myLSD.cpp" \
    -lopencv_core -lopencv_imgproc
echo "built $OUT/lsd_trace"
