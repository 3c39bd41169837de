#!/bin/sh
# Build the native host-side components (C++17, no external deps).
set -e
cd "$(dirname "$0")"
# -mtune (not -march): the .so must run on hosts without this machine's
# ISA extensions; loaders also run a known-answer self-test before use.
g++ -O3 -mtune=native -std=c++17 -shared -fPIC -pthread \
    fastcsv.cpp -o libptvcsv.so
echo "built native/libptvcsv.so"
g++ -O3 -mtune=native -std=c++17 -shared -fPIC \
    fasttiff.cpp -o libptvtiff.so
echo "built native/libptvtiff.so"
