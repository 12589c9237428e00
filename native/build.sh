#!/bin/sh
# Build the native host-warp library. Re-run after editing warp.cc.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -o libihprwarp.so warp.cc
echo "built $(pwd)/libihprwarp.so"
