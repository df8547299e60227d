#!/bin/sh
# Run a command with the axon-TPU environment (background Bash shells
# do not inherit the profile env; source of truth: the interactive
# session env as of 2026-08-20).
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
export AXON_LOOPBACK_RELAY=1
export PALLAS_AXON_TPU_GEN=v5e
export PALLAS_AXON_POOL_IPS=127.0.0.1
export PALLAS_AXON_REMOTE_COMPILE=1
export TPU_SKIP_MDS_QUERY=1
export PYTHONUNBUFFERED=1
cd /root/repo
exec "$@"
