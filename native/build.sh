#!/bin/sh
# Build the native beat-preprocessing library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libbeatprep.so beatprep.cpp
echo "built $(pwd)/libbeatprep.so"
