#!/bin/sh
# TPU validation sequence: everything that must pass on the real chip before
# quoting numbers. Run from anywhere; logs to /tmp/tpu_validate/.
#
# Order matters: the byte-parity drive first (cheapest, catches route bugs),
# then the hardware certification suite, then the benchmark. Each step
# tolerates one axon lease cooldown (a fresh process can hang for ~1-2 min
# after another process held the chip; see CLAUDE.md environment notes).
set -u
OUT=/tmp/tpu_validate
mkdir -p "$OUT"
REF=/tmp/refbuild/bin
SRC=/root/repo/tests/golden/tiny422.16p2
cd /tmp

step() {
    name=$1; shift
    echo "== $name =="
    if timeout "$@" >"$OUT/$name.log" 2>&1; then
        echo "   ok"
    else
        echo "   FAILED/timeout — one retry after lease cooldown"
        sleep 90
        if timeout "$@" >"$OUT/$name.retry.log" 2>&1; then
            echo "   ok (retry)"
        else
            echo "   FAILED (see $OUT/$name*.log)"
            return 1
        fi
    fi
}

[ -x "$REF/EncodeStream" ] || sh /root/repo/scripts/build_reference.sh

# 1. byte-parity of the TPU-default encode route (exercises the MXU table
#    lookup + device entropy pack end-to-end against the reference binary)
"$REF/EncodeStream" -m HQ_CBR -x 64 -y 32 -f 4:2:2 -l 10 -n 2 -k LeGall \
    -d 2 -u 1 -a 2 -S 1 -s 2048 "$SRC" "$OUT/ref_cbr.vc2"
step cbr_parity 300 python3 -m vc2tpu.cli.encode_stream -m HQ_CBR \
    -x 64 -y 32 -f 4:2:2 -l 10 -n 2 -k LeGall -d 2 -u 1 -a 2 -S 1 -s 2048 \
    "$SRC" "$OUT/tpu_cbr.vc2" || exit 1
cmp "$OUT/ref_cbr.vc2" "$OUT/tpu_cbr.vc2" || { echo "CBR BYTES DIFFER"; exit 1; }
echo "   CBR stream byte-identical on TPU"

# 2. hardware certification: the golden suite on the real chip
step tpu_cert 3600 env VC2TPU_TEST_TPU=1 python3 -m pytest \
    /root/repo/tests/test_golden.py /root/repo/tests/test_device_pack.py \
    /root/repo/tests/test_device_unpack.py \
    /root/repo/tests/test_pallas_lift.py -q || exit 1
tail -2 "$OUT"/tpu_cert*.log

# 3. the driver benchmark (stdout json + bench-tail on stderr)
step bench 3600 python3 /root/repo/bench.py || exit 1
cat "$OUT"/bench*.log
