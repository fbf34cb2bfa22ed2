#!/usr/bin/env bash
# Build the native assembly library -> native/libprojector.so
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    native/projector.cpp -o native/libprojector.so
echo "built native/libprojector.so"
