#!/bin/bash
# Regenerate golden fixtures from a fresh Verify run. Run AFTER sbt test is
# green (DedupSpec etc. pin the semantics these fixtures snapshot).
#
#   ./tools/regen_fixtures.sh                      # sf0.01: every fixture query
#   ./tools/regen_fixtures.sh /root/repo/bench10x  # scale-keyed: only the
#       corpus-dependent fixtures (q29-q32), emitted as
#       fixtures/<q>_bench10x.parquet and selected at verify time by
#       SparkEntry.oracleSqlFor. The media fixtures (q36, q56-q58, q66,
#       q84, q133, q144, q147) read fixed committed input corpora, not the
#       sfDir tables, so their sf001 snapshot is valid at every scale.
set -euo pipefail
cd "$(dirname "$0")/.."

DIR="${1:-/root/testdata/sf0.01}"
TAG="$(basename "$DIR" | tr -cd '[:alnum:]')"

if [ "$TAG" = "sf001" ]; then
  QS="q29_minhash:q29_minhash_dedup q30_simhash:q30_simhash_dedup \
      q31_lsh:q31_lsh_topk q32_annotate:q32_annotate q36_media:q36_media_features \
      q56_image:q56_image_dedup q57_audio:q57_audio_dedup \
      q58_video:q58_video_dedup q66_video:q66_mp4avi_dedup \
      q84_video:q84_avc_keydedup q133_video:q133_avc_pixel_dedup \
      q144_video:q144_avc_motion_dedup q147_video:q147_avc_entropy_dedup \
      q150_video:q150_avc_motion_entropy_dedup \
      q151_video:q151_avc_bidir_dedup \
      q153_video:q153_avc_b8x8_dedup \
      q154_video:q154_avc_fade_dedup \
      q155_video:q155_hevc_keydedup \
      q156_video:q156_avc_multiref_dedup \
      q157_video:q157_avc_deblock_dedup \
      q158_video:q158_hevc_pixel_dedup \
      q159_video:q159_hevc_residual_dedup \
      q160_video:q160_hevc_deblock_dedup \
      q161_video:q161_avc_multislice_dedup \
      q162_audio:q162_mp3_tag_dedup \
      q163_video:q163_hevc_inter_dedup \
      q164_audio:q164_g711_dedup \
      q165_audio:q165_aac_payload_dedup \
      q166_video:q166_avc_longterm_dedup \
      q167_audio:q167_flac_tag_dedup \
      q168_video:q168_hevc_sao_dedup \
      q169_audio:q169_ogg_opus_dedup \
      q170_video:q170_hevc_bidir_dedup \
      q171_audio:q171_flac_decoded_dedup \
      q172_video:q172_avc_coding_census \
      q173_video:q173_hevc_wp_dedup \
      q174_video:q174_hevc_multiref_dedup \
      q175_video:q175_hevc_remux_dedup"
else
  QS="q29_minhash:q29_minhash_dedup q30_simhash:q30_simhash_dedup \
      q31_lsh:q31_lsh_topk q32_annotate:q32_annotate"
fi

NAMES=$(for q in $QS; do echo -n "${q##*:},"; done | sed 's/,$//')
OUT="target/fixture_regen_$TAG"
sbt -batch "runMain graft.tools.VerifyOne $NAMES $DIR $OUT"

for q in $QS; do
  fix="fixtures/${q%%:*}_$TAG.parquet"; src="$OUT/${q##*:}"
  rm -rf "$fix" && mkdir -p "$fix"
  cp "$src"/*.parquet "$fix/part-0.parquet"
done
echo "fixtures regenerated for $TAG; re-run: python3 tools/check_oracle.py <verify_out> $DIR"
