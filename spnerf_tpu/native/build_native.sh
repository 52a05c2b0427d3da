#!/bin/sh
# Build the native host-side kernels (ctypes shared libraries).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -o libdsmr.so dsmr.cpp
echo "built $(pwd)/libdsmr.so"
