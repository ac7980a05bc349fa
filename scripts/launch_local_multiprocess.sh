#!/usr/bin/env bash
# Launch N local processes sharing a JAX coordination service — the
# multi-process-without-a-cluster test harness (parity with the reference's
# distributed_run.sh / claude_distributed_run.sh LOCAL_PROCS mode, minus the
# hard-coded credentials).
#
#   ./scripts/launch_local_multiprocess.sh 4 examples/multiprocess_toy.py
#   LOCAL_DEVICES_PER_PROC=2 ./scripts/launch_local_multiprocess.sh 2 -m video_vae_tpu.cli.train --tiny --steps 2
set -euo pipefail

NPROCS="${1:?usage: launch_local_multiprocess.sh NPROCS script.py [args...]}"
shift
PORT="${COORDINATOR_PORT:-12355}"
DEVICES_PER_PROC="${LOCAL_DEVICES_PER_PROC:-1}"
LOGDIR="$(mktemp -d /tmp/vvt_multiproc.XXXX)"

PIDS=()
for ((i = 0; i < NPROCS; i++)); do
  JAX_PLATFORMS=cpu \
  JAX_NUM_CPU_DEVICES="${DEVICES_PER_PROC}" \
  JAX_COORDINATOR_ADDRESS="localhost:${PORT}" \
  JAX_NUM_PROCESSES="${NPROCS}" \
  JAX_PROCESS_ID="${i}" \
    python "$@" >"${LOGDIR}/proc${i}.log" 2>&1 &
  PIDS+=($!)
done

STATUS=0
for ((i = 0; i < NPROCS; i++)); do
  if ! wait "${PIDS[$i]}"; then
    STATUS=1
    echo "--- process ${i} FAILED ---"
  fi
done

for ((i = 0; i < NPROCS; i++)); do
  echo "===== proc ${i} (${LOGDIR}/proc${i}.log) ====="
  tail -n 20 "${LOGDIR}/proc${i}.log"
done
exit "${STATUS}"
