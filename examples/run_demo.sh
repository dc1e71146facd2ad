#!/usr/bin/env bash
# ntsynt-tpu demo: generate a 3-genome synthetic dataset with known SVs,
# run the full pipeline, compute block stats, and render plots.
# (Counterpart of the reference's tests/run_ntSynt_demo.sh, which needs
# C. elegans FASTAs that are not in this snapshot.)
set -euo pipefail
cd "$(dirname "$0")"
OUT=demo_out
mkdir -p $OUT
python make_demo_genomes.py $OUT

cd $OUT
python -m ntsynt_tpu demoA.fa demoB.fa demoC.fa -d 1 -p demo --benchmark
python -m ntsynt_tpu.analysis.stats --tsv demo.synteny_blocks.tsv \
    --fai demoA.fa.fai demoB.fa.fai demoC.fa.fai
python - <<'PY'
from ntsynt_tpu.viz import write_sequence_lengths, write_links, write_chromosome_painting
from ntsynt_tpu.viz.plot import ribbon_plot, painting_plot
write_sequence_lengths(["demoA.fa.fai", "demoB.fa.fai", "demoC.fa.fai"], "demo_viz")
write_links("demo.synteny_blocks.tsv", "demo_viz", min_length=5000)
write_chromosome_painting("demo.synteny_blocks.tsv", "demoA.fa", "demo_painting.tsv")
ribbon_plot("demo_viz.sequence_lengths.tsv", "demo_viz.links.tsv", "demo_ribbon.png")
painting_plot("demo_painting.tsv", "demo_painting.png")
print("plots: demo_ribbon.png demo_painting.png")
PY
echo "demo complete; outputs in examples/$OUT"
