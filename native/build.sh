#!/bin/sh
# Build the native host-warp library. Re-run after editing warp.cc
# (ihpr_tpu/data/native.py also rebuilds automatically when warp.cc is
# newer than the .so). Compile to a temp file + atomic rename so
# concurrent builders (multi-process loaders) never expose a half-written
# library to ctypes.
set -e
cd "$(dirname "$0")"
EXTRA=""
if [ -f /usr/include/jpeglib.h ]; then
    EXTRA="-DIHPR_HAVE_JPEG -ljpeg"
fi
TMP="libihprwarp.so.$$"
g++ -O3 -march=native -fopenmp -shared -fPIC -o "$TMP" warp.cc $EXTRA
mv -f "$TMP" libihprwarp.so
echo "built $(pwd)/libihprwarp.so (jpeg: ${EXTRA:-no})"
