"""Overlap independent eager materializations on driver threads.

Several builders materialize two INDEPENDENT model tables back to back
(e.g. moore_lewis_select's background type table and its in-domain
lm_train, speculative_acceptance's unigram draft counts and bigram
target counts). Each materialization is an eager localCheckpoint whose
wall cost is dominated by driver job latency locally and by a full
input pass at scale. Spark's scheduler happily runs several jobs at
once inside one application (guide §2.6 "Overlap independent jobs");
actions are only sequential because driver code calls them
sequentially — so submitting independent chains from a small thread
pool lets the later chain's tasks back-fill executors idled by the
earlier chain's tail, at any scale.

This overlaps JOB SUBMISSION only: each thunk builds and materializes
the same frames it would have built sequentially, so results are
bit-identical by construction. Thread count equals the (small, fixed)
number of independent chains a builder has — never data-sized.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable


def build_concurrently(*thunks: Callable[[], Any]) -> list[Any]:
    """Run the given zero-arg builder thunks on driver threads and
    return their results in argument order. Exceptions propagate (the
    first failing thunk's error, after all threads finish submitting).

    py4j's ClientServer gives each Python thread its own JVM
    connection, and Spark job properties (description, group) are
    thread-local, so concurrent submission is safe; FIFO scheduling
    back-fills naturally.
    """
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
