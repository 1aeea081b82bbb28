#!/bin/bash
# Run python on the CPU backend regardless of the container's axon
# sitecustomize (which pins JAX_PLATFORMS=axon at interpreter startup
# and BLOCKS while another process holds the TPU). Mirrors
# __graft_entry__._sanitized_cpu_env for shell use:
#   bash scripts/cpu_python.sh -c "..."        # 1 virtual device
#   NDEV=8 bash scripts/cpu_python.sh script.py  # 8-device CPU mesh
NDEV="${NDEV:-1}"
CLEAN_PYTHONPATH=/root/repo
exec env -u AXON_LOOPBACK_RELAY -u PALLAS_AXON_TPU_GEN \
  -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
  -u JAX_PLATFORM_NAME -u LIBTPU_INIT_ARGS \
  PYTHONPATH="$CLEAN_PYTHONPATH" JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=${NDEV} --xla_cpu_collective_call_terminate_timeout_seconds=300" \
  python "$@"
