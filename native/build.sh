#!/bin/sh
# Build the native host runtime: libdeepvcp_native.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -fopenmp -std=c++17 \
    pointcloud.cc -o libdeepvcp_native.so
echo "built $(pwd)/libdeepvcp_native.so"
