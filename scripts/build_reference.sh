#!/bin/sh
# Build the upstream reference binaries (bbc/vc2-reference at /root/reference)
# without autotools/boost, using the minimal boost shim headers vendored in
# third_party/boost_shim (written from scratch for this project; the reference
# only instantiates a small surface of boost::multi_array).
#
# Produces EncodeStream / DecodeStream / DecodeFrame under $OUT (default
# /tmp/refbuild/bin). These are used for golden-stream conformance fixtures
# (tests/make_golden.py) and for measuring the baseline in BASELINE.md.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/refbuild/bin}
SHIM=$(dirname "$0")/../third_party/boost_shim
mkdir -p "$OUT"
CXX=${CXX:-g++}
FLAGS="-O2 -std=c++14 -I $REF/src -I $REF/src/Library -I $SHIM"
$CXX $FLAGS $REF/src/Library/src/*.cpp \
    $REF/src/EncodeStream/EncodeStream.cpp $REF/src/EncodeStream/EncodeParams.cpp \
    -o "$OUT/EncodeStream"
$CXX $FLAGS $REF/src/Library/src/*.cpp \
    $REF/src/DecodeStream/DecodeStream.cpp $REF/src/DecodeStream/DecodeParams.cpp \
    -o "$OUT/DecodeStream"
$CXX $FLAGS $REF/src/Library/src/*.cpp \
    $REF/src/DecodeFrame/DecodeFrame.cpp $REF/src/DecodeFrame/DecodeParams.cpp \
    -o "$OUT/DecodeFrame"
echo "built reference binaries in $OUT"
