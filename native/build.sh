#!/bin/sh
# Build the native runtime core -> native/libasd_native.so
# (g++ only; no external deps). Run from anywhere.
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -o libasd_native.so allocator.cc
echo "built $(pwd)/libasd_native.so"
