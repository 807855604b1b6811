#!/bin/sh
# Build the native host-side components into aid_tpu/native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../aid_tpu/native
g++ -O3 -march=native -shared -fPIC dp_solver.cc -o ../aid_tpu/native/libdp_solver.so
echo "built aid_tpu/native/libdp_solver.so"
