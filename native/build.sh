#!/bin/sh
# Build the native data loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 dataio.cpp -ljpeg \
    -o libcsu_dataio.so
echo "built $(pwd)/libcsu_dataio.so"
