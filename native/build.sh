#!/bin/bash
# Build the native BOP annotation parser into scflow_tpu/datasets/.
set -e
cd "$(dirname "$0")"
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
g++ -O3 -shared -fPIC -std=c++17 -I"$PYINC" bop_annots.cpp \
    -o "../scflow_tpu/datasets/_bop_annots$EXT"
echo "built ../scflow_tpu/datasets/_bop_annots$EXT"
