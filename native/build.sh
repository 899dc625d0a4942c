#!/bin/sh
# Build the native data-path library. Output lands next to the Python
# wrapper so `hifidiff_tpu.data.native` finds it without configuration.
set -e
cd "$(dirname "$0")"
mkdir -p ../hifidiff_tpu/data/_native
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    -o ../hifidiff_tpu/data/_native/libhifidiff_native.so \
    src/hifidiff_native.cc
echo "built hifidiff_tpu/data/_native/libhifidiff_native.so"
