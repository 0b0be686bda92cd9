#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 3000 python -u out/r5/serve_var.py 2>out/r5/serve_var.err
echo QUEUE15_DONE
