#!/bin/sh
# Build the native kernels into native/libt2ms_native.so.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -shared -fPIC -o libt2ms_native.so dtw.cpp
echo "built $(pwd)/libt2ms_native.so"
