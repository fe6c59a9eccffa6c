#!/bin/bash
# Regenerate the fixtures/x265 external HEVC vectors (r14): streams +
# per-frame reconstructions produced by the SYSTEM libx265.so.199
# (x265 3.5, Debian libx265-199 — an independently-authored encoder,
# not this repo's code). X265VectorSpec pins the in-repo decoder
# bit-exact against these recons; tools/x265_vector.c is the driver.
#
# Inputs are deterministic (seedless integer formulas), so a rebuild on
# the same libx265 build reproduces the committed bytes.
#
# x265 param notes (the decoder tier intersection):
#   signhide=0 temporal-mvp=0 strong-intra-smoothing=0 — the three
#   tools the tier rejects by design; everything else (deblocking, SAO,
#   subpel ME, B frames, weighted prediction, 3-reference lists) is
#   x265 defaults or stronger.
# 64-wide caveat: x265 emits internally-inconsistent recon pixels at
# picture corners of 1-CTU-WIDE inter frames (recon disagrees with any
# conformant reconstruction of its own coded stream — flat reference +
# DC-only residual cannot produce the corner value it reports); inter
# vectors therefore use 128x64. See PERF.md r14.
set -eu
cd "$(dirname "$0")/.."
gcc -O2 -o /tmp/x265vec tools/x265_vector.c -l:libx265.so.199

python3 - <<'EOF'
def gen(w, h, frames, path):
    out = bytearray()
    for f in range(frames):
        for y in range(h):
            for x in range(w):
                v = (16 + ((x*3 + y*5 + f*11) % 200))
                if (f*4) <= x < (f*4)+16 and 20 <= y < 36: v = 230 - (x - f*4)
                out.append(v)
        for c in range(2):
            for y in range(h//2):
                for x in range(w//2):
                    out.append(110 + ((x + y + f*7 + c*40) % 60))
    open(path, 'wb').write(bytes(out))
gen(64, 64, 5, 'fixtures/x265/in_64x64_5f.yuv')
gen(128, 64, 6, 'fixtures/x265/in_128x64_6f.yuv')
EOF

COMMON="signhide=0 temporal-mvp=0 strong-intra-smoothing=0 subme=7"
V=fixtures/x265
/tmp/x265vec 64 64 5 $V/in_64x64_5f.yuv $V/intra_64x64.265 \
  $V/intra_64x64_recon.yuv keyint=1 bframes=0 $COMMON
/tmp/x265vec 128 64 6 $V/in_128x64_6f.yuv $V/p_128x64.265 \
  $V/p_128x64_recon.yuv bframes=0 ref=1 weightp=0 $COMMON
/tmp/x265vec 128 64 6 $V/in_128x64_6f.yuv $V/b_128x64.265 \
  $V/b_128x64_recon.yuv bframes=2 b-pyramid=0 ref=1 weightp=0 weightb=0 $COMMON
/tmp/x265vec 128 64 6 $V/in_128x64_6f.yuv $V/wp_128x64.265 \
  $V/wp_128x64_recon.yuv bframes=0 ref=1 weightp=1 $COMMON
/tmp/x265vec 128 64 6 $V/in_128x64_6f.yuv $V/mr_128x64.265 \
  $V/mr_128x64_recon.yuv bframes=0 ref=3 weightp=0 $COMMON
# r15: sign_data_hiding live (the P config with signhide=1 — one of the
# two named gaps the original vectors disabled; decode landed r15)
/tmp/x265vec 128 64 6 $V/in_128x64_6f.yuv $V/sh_128x64.265 \
  $V/sh_128x64_recon.yuv bframes=0 ref=1 weightp=0 \
  signhide=1 temporal-mvp=0 strong-intra-smoothing=0 subme=7
# r15: temporal MVP live (the OTHER named gap) — P and B configs with
# temporal-mvp=1: slice_temporal_mvp flags, collocated_* syntax,
# §8.5.3.2.8/9 temporal merge+AMVP candidates incl. POC scaling and
# the B-slice collocated_from_l0 list selection
/tmp/x265vec 128 64 6 $V/in_128x64_6f.yuv $V/tmvp_p_128x64.265 \
  $V/tmvp_p_128x64_recon.yuv bframes=0 ref=1 weightp=0 \
  signhide=0 temporal-mvp=1 strong-intra-smoothing=0 subme=7
/tmp/x265vec 128 64 6 $V/in_128x64_6f.yuv $V/tmvp_b_128x64.265 \
  $V/tmvp_b_128x64_recon.yuv bframes=2 b-pyramid=0 ref=1 weightp=0 \
  weightb=0 signhide=0 temporal-mvp=1 strong-intra-smoothing=0 subme=7
echo "regenerated $(ls $V | wc -l) files in $V"
