#!/bin/bash
# Round-10 scale corpus regeneration: sf1/sf10 (bit-identical to r9's
# perturbation for replicas < 100) + the new sf100 tier.
set -e
cd /root/repo
python tools/gen_scale_data.py 10 /root/testdata/sf0.1 /root/repo/scale_data/sf1 > /root/repo/scale_data_gen_sf1.log 2>&1
python tools/gen_scale_data.py 100 /root/testdata/sf0.1 /root/repo/scale_data/sf10 > /root/repo/scale_data_gen_sf10.log 2>&1
python tools/gen_scale_data.py 1000 /root/testdata/sf0.1 /root/repo/scale_data/sf100 > /root/repo/scale_data_gen_sf100.log 2>&1
echo DONE
