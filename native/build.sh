#!/bin/sh
# Build the native host-side components (C++17, no external deps).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    fastcsv.cpp -o libptvcsv.so
echo "built native/libptvcsv.so"
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    fasttiff.cpp -o libptvtiff.so
echo "built native/libptvtiff.so"
