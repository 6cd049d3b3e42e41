#!/bin/sh
# Build the native host-loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libvcg_host.so \
    vcg_host.cc -ljpeg -lpthread
echo "built $(pwd)/libvcg_host.so"
