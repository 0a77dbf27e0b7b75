#!/bin/sh
# ComMU dataset preparation: test split then FluidSynth rendering
# (reference: scripts/commu/process_commu_dataset.sh:1-2; the reference's
# first line has a `.python3` typo — the intent is the two steps below).
python3 -m mr_mt3_tpu.scripts.create_commu_test_split "$@"
python3 -m mr_mt3_tpu.scripts.render_commu "$@"
