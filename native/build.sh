#!/bin/sh
# Build libadx_data.so from adx_data.cpp (source -> .so provenance).
#
# The committed binary beside this script was produced by exactly this
# command; autoregressive_diffusion_tpu/data/native.py also rebuilds it
# automatically on first use when the source is newer than the binary
# (same flags, with a no-OpenMP fallback for minimal toolchains).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC adx_data.cpp -o libadx_data.so
echo "built libadx_data.so"
