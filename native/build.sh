#!/bin/sh
# Build the native host engine (also invoked lazily by
# icebin_tpu/ops/native.py on first use).
set -e
cd "$(dirname "$0")"
CXX=${CXX:-g++}
$CXX -O3 -march=native -fopenmp -shared -fPIC clip.cc zarray.cc -o libicebin_native.so
echo "built $(pwd)/libicebin_native.so"
