#!/bin/bash
# retry wrapper: the remote compile service has transient outages
# (observed ~30 min); a fresh attempt after a pause recovers.
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
for i in 1 2 3 4 5; do
    python -m sevennet_finetuning_tpu.main train ft900_converge.yaml -w conv_out \
        >> conv_out.log 2>&1 && exit 0
    echo "attempt $i failed at $(date), retrying in 90s" >> conv_out.log
    sleep 90
done
exit 1
