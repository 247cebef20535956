"""Production serving: mesh-DP model -> micro-batching service -> HTTP.

    python examples/serve_http.py [port]

Client side (any language): POST float32 LE bytes of (N, 112, 112, 3)
faces in [-1, 1] BGR to /embed; read (2, N, 512) float32 back. See
ffrnet_tpu/serving/http.py for the full wire format.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from ffrnet_tpu.api import FFRNet
    from ffrnet_tpu.serving import EmbeddingHTTPServer, EmbeddingService

    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8571
    # .shard() spreads inference over every visible chip; harmless on one
    model = FFRNet.random(0).shard()
    svc = EmbeddingService(model, max_batch=256, max_delay_s=0.002)
    print("compiling bucket programs...")
    svc.warmup()
    with EmbeddingHTTPServer(svc, ("0.0.0.0", port)) as srv:
        print(f"serving on :{srv.port}  (GET /healthz, /stats; "
              f"POST /embed, /verify). Ctrl-C to stop.")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass
    svc.close()
    s = svc.stats
    print(f"served {s.faces} faces in {s.batches} dispatches "
          f"(mean batch {s.mean_batch:.1f})")


if __name__ == "__main__":
    main()
