#!/bin/bash
# Build the native host-side kernels into uivr_tpu/native/libuivr_native.so
set -e
cd "$(dirname "$0")"
mkdir -p ../uivr_tpu/native
g++ -O3 -march=native -shared -fPIC -std=c++17 uivr_native.cpp \
    -o ../uivr_tpu/native/libuivr_native.so
echo "built ../uivr_tpu/native/libuivr_native.so"
