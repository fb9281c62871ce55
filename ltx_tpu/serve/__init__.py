"""Serving subsystem: dynamic micro-batching + job queue + HTTP front-end.

No reference analog (the Swift CLI is strictly one-shot) — this turns the
measured serving primitives (batched decode sharing every weight DMA,
prompt-lookup speculative drafts; docs/BENCH_NOTES.md §6-7b) into a
deployable stack for one-or-more-chip production use.

Design note — why REQUEST-level micro-batching, not slot-level continuous
batching: the batched Gemma decode runs as ONE compiled device program
(lax.while_loop over tokens) precisely so that token steps never cross the
host boundary. Joining a new request mid-flight would require stepping the
loop from the host, paying the ~30-40 ms fixed dispatch+readback latency
PER TOKEN (CLAUDE.md) — more than the 22 ms w8a8 token itself. Coalescing
requests at batch boundaries keeps the device program whole; at 512-token
batches a new arrival waits at most one batch (~7 s at B=4) and overall
throughput is the measured 3-7x, which is the right trade for TPU.
"""

from ltx_tpu.serve.batcher import MicroBatcher  # noqa: F401
from ltx_tpu.serve.jobs import JobQueue  # noqa: F401
from ltx_tpu.serve.server import make_server  # noqa: F401
