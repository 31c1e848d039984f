#!/bin/sh
# Build the gcmce_* C ABI library (Fortran-GCM-facing coupler boundary).
set -e
cd "$(dirname "$0")"
CXX=${CXX:-g++}
PYCFG=${PYCFG:-python3-config}
$CXX -O2 -shared -fPIC gcmce.cc $($PYCFG --includes) $($PYCFG --ldflags --embed) \
    -o libicebin_gcmce.so
echo "built $(pwd)/libicebin_gcmce.so"
