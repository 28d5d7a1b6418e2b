#!/bin/bash
# CSDVS (center-surround DVS) reproduction recipes — counterpart of the
# reference's scripts/csdvs.sh (2022 ICIP CSDVS paper runs): each stimulus
# is converted twice, once as plain DVS and once with the center-surround
# pixel enabled, with the paper's lambda/tau settings.  Our CSDVS surround
# solves the screened-Poisson steady state in closed form by default
# (emulator/core.py::_update_csdvs); add --csdvs_solver euler via the
# library API to reproduce the reference's bounded Euler stepping.
set -e
OUT=${1:-output}
COMMON="--pos_thres .2 --neg_thres .2 --sigma_thres 0.02 --cutoff_hz 100 \
 --refractory_period 1e-3 --leak_rate_hz 0 --shot_noise_rate_hz 1 \
 --output_width 346 --output_height 260 --disable_slomo \
 --dvs_exposure duration .01 --unique_output_folder false --overwrite \
 --skip_video_output"

# spots: flashing + moving shapes
python v2e.py $COMMON --output_folder "$OUT/spots-dvs" \
  --synthetic_input scripts.spots --dt 1e-4 --freq 20 --contrast 2 \
  --dvs_aedat2 dvs.aedat
python v2e.py $COMMON --output_folder "$OUT/spots-csdvs" \
  --cs_lambda_pixels 10 --cs_tau_p_ms .5 \
  --synthetic_input scripts.spots --dt 1e-4 --freq 20 --contrast 2 \
  --dvs_aedat2 csdvs.aedat

# gradients: triangular intensity bump sweep
python v2e.py $COMMON --output_folder "$OUT/gradients-dvs" \
  --synthetic_input scripts.gradients --dt 1e-4 --contrast 2 \
  --dvs_aedat2 dvs.aedat
python v2e.py $COMMON --output_folder "$OUT/gradients-csdvs" \
  --cs_lambda_pixels 10 --cs_tau_p_ms .5 \
  --synthetic_input scripts.gradients --dt 1e-4 --contrast 2 \
  --dvs_aedat2 csdvs.aedat
