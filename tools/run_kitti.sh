#!/bin/bash
# Turnkey KITTI validation: VO + flagship map (+ depth smoke) with ATE/drift
# gates. See tools/run_kitti.py for details.
#
#   tools/run_kitti.sh <sequence_dir> [--poses poses/NN.txt] [--weights DIR]
#   tools/run_kitti.sh synthetic          # dry run on exact-GT synthetic
exec python "$(dirname "$0")/run_kitti.py" "$@"
