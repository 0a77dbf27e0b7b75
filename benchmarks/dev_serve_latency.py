"""Serving latency under concurrent clients (real TPU).

Starts serve.py's handler+MicroBatcher in-process with random weights
(worst-case EOS behavior: full decode budget every request), then has N
concurrent clients POST 2 s WAV clips through the HTTP surface and
reports p50/p95 end-to-end latency.

Usage: python benchmarks/dev_serve_latency.py [quantize] [n_clients] [reqs]
       (quantize: fused_int4 | fused | none; default fused)

A large `reqs` per client doubles as a SOAK test: host RSS is sampled
every ~25 completed requests, so unbounded growth (a per-request leak in
the HTTP layer, batcher, decode path, or host postprocess) shows up as a
monotonic RSS ramp rather than going unnoticed until production.
"""

import io
import os
import struct
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def wav_bytes(seconds=2.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    pcm = (rng.normal(size=int(sr * seconds)) * 3000).astype('<i2')
    data = pcm.tobytes()
    hdr = (b'RIFF' + struct.pack('<I', 36 + len(data)) + b'WAVEfmt '
           + struct.pack('<IHHIIHH', 16, 1, 1, sr, sr * 2, 2, 16)
           + b'data' + struct.pack('<I', len(data)))
    return hdr + data


def _rss_mb() -> float:
    with open('/proc/self/status') as f:
        for line in f:
            if line.startswith('VmRSS:'):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    quantize = sys.argv[1] if len(sys.argv) > 1 else 'fused'
    n_clients = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reqs_per_client = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from mr_mt3_tpu.infer import InferenceHandler
    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.utils.bench_helpers import zero_variables
    import serve

    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    handler = InferenceHandler(model=model,
                               variables=zero_variables(model),
                               batch_size=8, quantize=quantize)
    srv = serve.make_server(handler, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f'http://127.0.0.1:{srv.server_address[1]}/transcribe'

    import json as _json

    def batches_so_far():
        return _json.loads(urllib.request.urlopen(
            url.replace('/transcribe', '/healthz'),
            timeout=30).read()).get('batches', 0)

    body = wav_bytes()
    # warm the program (pays first-execution startup once)
    t0 = time.time()
    urllib.request.urlopen(urllib.request.Request(
        url, data=body, method='POST'), timeout=600).read()
    print(f'warmup: {time.time() - t0:.1f}s', flush=True)
    batches0 = batches_so_far()

    lat = []
    lock = threading.Lock()

    rss_samples = [(0, _rss_mb())]

    def client(cid):
        for r in range(reqs_per_client):
            t0 = time.time()
            resp = urllib.request.urlopen(urllib.request.Request(
                url, data=wav_bytes(seed=cid * 100 + r), method='POST'),
                timeout=600)
            resp.read()
            with lock:
                lat.append(time.time() - t0)
                if len(lat) % 25 == 0:
                    rss_samples.append((len(lat), _rss_mb()))

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    lat.sort()
    n = len(lat)
    print(f'quantize={quantize} clients={n_clients}: {n} requests in '
          f'{wall:.2f}s  p50 {lat[n // 2]:.2f}s  '
          f'p95 {lat[min(n - 1, int(n * 0.95))]:.2f}s  '
          f'(device batches this run: {batches_so_far() - batches0})',
          flush=True)
    rss_samples.append((n, _rss_mb()))
    trace = '  '.join(f'{k}:{mb:.0f}MB' for k, mb in rss_samples)
    print(f'rss over requests: {trace}  '
          f'(delta {rss_samples[-1][1] - rss_samples[0][1]:+.0f} MB)',
          flush=True)


if __name__ == '__main__':
    main()
