#!/usr/bin/env bash
# Dataset acquisition — reference parity: data/download_data.sh.
#
# The real ActivityNet-SRL stack is assembled from public releases:
#   1. ActivityNet Captions     http://cs.stanford.edu/people/ranjaykrishna/densevid/
#   2. ActivityNet-Entities     https://github.com/facebookresearch/ActivityNet-Entities
#      (noun-phrase box annotations + Faster R-CNN fc6 RoI feature h5,
#       10 frames x 100 proposals x 2048-d per segment)
#   3. TSN segment features     rgb_motion_1d (2048-d RGB + 1024-d Flow)
#      from the grounded-video-description release
#   4. GloVe 840B.300d          https://nlp.stanford.edu/projects/glove/
#
# This environment has no network egress, so --synthetic builds the
# real-shaped synthetic mini-ASRL instead (same on-disk schema; see
# vog_tpu/data/fixtures.py).  After downloading real data, run the dcode
# pipeline:
#   python -m vog_tpu.dcode.srl_tagger       (BERT-SRL over captions)
#   python -m vog_tpu.dcode.align_args       (SRL args <-> AE boxes)
#   python -m vog_tpu.dcode.gt5_builder data/asrl_p100 data/asrl_gt5
#   python -m vog_tpu.dcode.cs_builder data/asrl_gt5
set -euo pipefail
cd "$(dirname "$0")"
REPO_ROOT="$(cd .. && pwd)"

if [[ "${1:-}" == "--synthetic" ]]; then
    P=${2:-5}
    PYTHONPATH="$REPO_ROOT:${PYTHONPATH:-}" \
        python -m vog_tpu.data.fixtures "$(pwd)/asrl" "$P"
    echo "synthetic mini-ASRL (P=$P) written to data/asrl"
    exit 0
fi

echo "No network egress in this environment. Use --synthetic [num_props]"
echo "to build the synthetic mini-ASRL, or fetch the real releases listed"
echo "in the header of this script on a connected machine."
exit 1
