#!/bin/sh
# Build the native host-warp library. Re-run after editing warp.cc.
set -e
cd "$(dirname "$0")"
EXTRA=""
if [ -f /usr/include/jpeglib.h ]; then
    EXTRA="-DIHPR_HAVE_JPEG -ljpeg"
fi
g++ -O3 -march=native -fopenmp -shared -fPIC -o libihprwarp.so warp.cc $EXTRA
echo "built $(pwd)/libihprwarp.so (jpeg: ${EXTRA:-no})"
