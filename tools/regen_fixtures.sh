#!/bin/bash
# Regenerate the q29/q30 expected-survivor fixtures from a fresh Verify run
# at sf0.01. Run AFTER sbt test is green (DedupSpec pins the semantics these
# fixtures snapshot).
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify_out"
for q in q29_minhash:q29_minhash_dedup q30_simhash:q30_simhash_dedup \
         q31_lsh:q31_lsh_topk q32_annotate:q32_annotate q36_media:q36_media_features \
         q56_image:q56_image_dedup q57_audio:q57_audio_dedup \
         q58_video:q58_video_dedup q66_video:q66_mp4avi_dedup \
         q84_video:q84_avc_keydedup q133_video:q133_avc_pixel_dedup \
         q144_video:q144_avc_motion_dedup q147_video:q147_avc_entropy_dedup; do
  fix="fixtures/${q%%:*}_sf001.parquet"; src="target/verify_out/${q##*:}"
  rm -rf "$fix" && mkdir -p "$fix"
  cp "$src"/*.parquet "$fix/part-0.parquet"
done
echo "fixtures regenerated; re-run: python3 tools/check_oracle.py target/verify_out /root/testdata/sf0.01"
