#!/usr/bin/env python3
"""Serve exported GPT artifacts (cli/export_lm.py output).

Two schedulers (infer/serving.py):

- `scheduler: bucketed` (default) — LMServer buckets same-length requests
  into batched prefill+decode chains (one shared position counter).
- `scheduler: continuous` — ContinuousLMServer: a fixed pool of `slots`
  batch rows, each at its own position (`decode_rows`/`admit` artifacts);
  finished rows are refilled mid-flight, so mixed prompt/generation
  lengths share one device batch with no convoy effect. Adding
  `draft_artifacts` + `k_draft > 0` composes speculation in: every slot
  drafts/verifies k-token blocks at its own position (`extend_rows`),
  combining the throughput lever (continuous batch) with the latency
  lever (speculation).
- `scheduler: speculative` — SpeculativeLMServer: a small draft model
  (`draft_artifacts`, a second exported dir) proposes `k_draft` tokens,
  the target verifies the block in one `extend` pass. Output — greedy
  AND sampled — is exactly the target-only canonical chain (acceptance
  is against the canonical device stream), so speculation is a
  transparent latency lever (per-request decode).
- `scheduler: paged` — PagedLMServer (infer/paged.py): continuous
  batching over a PAGED KV cache (`n_pages` physical pages of the
  exported `page_size`, shared across slots, preemption when the pool
  runs dry) — the memory lever: slots oversubscribe cache HBM instead
  of reserving window-sized rows. Requires artifacts exported with
  `page_size > 0`. Outputs are per-request identical to `continuous`.

The rungs are ORTHOGONAL: `prefill_chunk` (long prompts) applies to
every scheduler; `draft_artifacts` + `k_draft` (speculation) compose
with continuous, paged, and online; `k_decode` (fused chunks) with
bucketed, continuous, paged, and online; `online` with continuous AND
paged (each engine is a stepper the threaded front drives); `logprobs`
requests ride the fused chunks everywhere. The only exclusion is
k_decode vs k_draft — alternative decode loops for the same dispatch
budget.

Two modes over either scheduler:

- `mode: batch` — read a JSONL request file ({"tokens": [...],
  "n_tokens": N, "temperature": T, "top_k": K, "top_p": P, "seed": S per line,
  plus "eos" — kept in the output — "stop": [[ids...], ...] —
  multi-token stop sequences, excluded from the output — and
  "logprobs": true — per-token raw-model logprobs in the response
  (rides the fused decode chunks on current artifacts) — under the
  continuous/online/paged/speculative schedulers), write
  `completions.jsonl` + `serving_info.yaml` (aggregate tokens/s).
- `mode: http` — a stdlib HTTP endpoint: GET /healthz -> artifact
  metadata; POST /generate with one request object or
  {"requests": [...]} -> completions; POST /v1/completions — an
  OpenAI-Completions-shaped surface over TOKEN IDS ('prompt' one list
  or a batch, 'max_tokens'/'temperature'/'top_p'/'stop'/'logprobs'/
  'seed'/'n'; n samples fan out over seeds seed..seed+n-1 per the
  canonical-stream contract) returning choices + usage counts.
  Single-threaded by default (the
  chip is single-tenant and a closed batch decodes sequentially). With
  `online: true` (continuous or paged scheduler, optionally with
  speculation) the endpoint becomes a
  TRUE online server: a ThreadingHTTPServer front + OnlineLMServer —
  concurrent POSTs from different clients join one running device
  batch mid-flight (a freed slot admits the next queued request
  between decode dispatches), which is how production
  continuous-batching hosts work.

The serving host runs from the StableHLO artifacts alone — this CLI never
imports the model or checkpoint code. (The reference has no serving
story: networks.py:727-754 re-runs eager python per token from the full
training source tree.)

Config:
  output_dir: <logs/completions dir>
  artifacts: <exported lm dir (the `lm/` dir export_lm.py writes)>
  mode: batch | http
  scheduler: bucketed | continuous | speculative
  slots: 8                          # continuous scheduler: batch rows
  draft_artifacts: <exported draft lm dir>  # speculation (speculative /
                                    #   continuous / paged / online)
  k_draft: 4                        # speculation: draft block size
  k_decode: 0                       # continuous/paged schedulers: >0 advances
                                    #   every slot K tokens per dispatch via
                                    #   the fused decode_k artifacts (greedy
                                    #   argmax or on-device sampling; must
                                    #   match the exported decode_chunk;
                                    #   alternative to k_draft)
  n_pages: 0                        # paged scheduler: physical pool pages
                                    #   (0 = dense-equivalent capacity)
  online: false                     # http + continuous/paged:
                                    #   OnlineLMServer — concurrent POSTs
                                    #   share one running batch (threaded
                                    #   endpoint); composes with k_decode
                                    #   OR draft speculation, and with the
                                    #   paged pool (n_pages)
  prefill_chunk: 0                  # >0: prefill long prompts in chunks of
                                    #   this size via the `extend` (dense) /
                                    #   extend_paged (paged) artifact
                                    #   (exact; bounds peak prefill memory;
                                    #   every scheduler)
  requests: <jsonl path>            # batch mode
  host: 127.0.0.1                   # http mode
  port: 8900                        # http mode
  max_requests: 0                   # http mode: exit after N POSTs (0 = run forever)
  default_n_tokens: 64
"""

from __future__ import annotations

import json
import time
from http.server import (BaseHTTPRequestHandler, HTTPServer,
                         ThreadingHTTPServer)
from pathlib import Path

from tempo_tpu.cli import run_cli
from tempo_tpu.utils.config import copy_config, load_config, require_keys, save_yaml
from tempo_tpu.utils.dirs import init_directory


def _serve_batch(server, config: dict, output_dir: Path,
                 default_n: int) -> None:
    req_path = Path(config["requests"])
    if not req_path.exists():
        raise ValueError(f"FATAL: requests file not found: {req_path}")
    requests = [json.loads(line) for line in
                req_path.read_text().splitlines() if line.strip()]
    print(f"Serving {len(requests)} requests from {req_path} ...")
    t0 = time.perf_counter()
    responses = server.serve_requests(requests, default_new_tokens=default_n)
    elapsed = time.perf_counter() - t0
    out_path = output_dir / "completions.jsonl"
    with out_path.open("w") as f:
        for resp in responses:
            f.write(json.dumps(resp) + "\n")
    n_generated = sum(r["n_generated"] for r in responses)
    info = {
        "n_requests": len(requests),
        "n_generated_tokens": n_generated,
        "elapsed_s": round(elapsed, 3),
        "tokens_per_sec": round(n_generated / max(elapsed, 1e-9), 2),
        "artifacts": str(config["artifacts"]),
    }
    if getattr(server, "last_stats", None):
        info["scheduler_stats"] = server.last_stats
    save_yaml(info, output_dir / "serving_info.yaml")
    print(f"Wrote {out_path}")
    print(f"Generated {n_generated} tokens in {elapsed:.2f}s "
          f"({info['tokens_per_sec']} tok/s)")


def _openai_to_requests(payload: dict, default_n: int) -> list:
    """Translate an OpenAI Completions-style body into scheduler
    requests. Prompts are TOKEN IDS (one list or a batch of lists — the
    framework serves artifacts, not tokenizers); `max_tokens`,
    `temperature`, `top_p`, `stop` (token-id sequences), `logprobs`
    (truthy -> per-token logprobs) and `seed` map directly. `n` samples
    per prompt fan out as n requests with seeds seed, seed+1, ... —
    under the canonical sampled stream identical seeds would return
    identical completions, so distinct samples REQUIRE distinct seeds
    (infer/serving.py device_sample)."""
    prompts = payload.get("prompt")
    if prompts is None:
        raise ValueError("missing 'prompt' (token ids)")
    if prompts and isinstance(prompts[0], int):
        prompts = [prompts]
    n = int(payload.get("n", 1))
    seed = int(payload.get("seed", 0))
    reqs = []
    for toks in prompts:
        for i in range(n):
            req = {"tokens": list(toks),
                   "n_tokens": int(payload.get("max_tokens", default_n)),
                   "seed": seed + i}
            for src, dst in (("temperature", "temperature"),
                             ("top_p", "top_p"), ("stop", "stop")):
                if payload.get(src) is not None:
                    req[dst] = payload[src]
            if payload.get("logprobs"):
                req["logprobs"] = True
            reqs.append(req)
    return reqs


def _openai_response(reqs: list, responses: list,
                     n_samples: int = 1) -> dict:
    """OpenAI Completions-style response over token ids: one choice per
    (prompt, sample), finish_reason 'stop' when a stop/eos fired,
    'length' when the budget ran out. usage counts each PROMPT once
    regardless of n (the fan-out repeats it per sample internally)."""
    choices = []
    for i, (req, resp) in enumerate(zip(reqs, responses)):
        choice = {
            "index": i,
            "tokens": resp["tokens"],
            "finish_reason": ("stop" if resp.get("stopped_early")
                              else "length"),
        }
        if "logprobs" in resp:
            choice["logprobs"] = {"token_logprobs": resp["logprobs"]}
        choices.append(choice)
    n_prompt = sum(len(r["tokens"]) for r in reqs) // max(n_samples, 1)
    n_out = sum(r["n_generated"] for r in responses)
    return {
        "object": "text_completion",
        "model": "tempo_tpu-lm",
        "choices": choices,
        "usage": {"prompt_tokens": n_prompt,
                  "completion_tokens": n_out,
                  "total_tokens": n_prompt + n_out},
    }


def _serve_http(server, config: dict, output_dir: Path,
                default_n: int, online: bool = False) -> None:
    host = str(config.get("host", "127.0.0.1"))
    port = int(config.get("port", 8900))
    max_requests = int(config.get("max_requests", 0))
    counter = {"posts": 0}

    class Handler(BaseHTTPRequestHandler):
        server_version = "tempo_tpu-lm"

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — stdlib API
            if self.path == "/healthz":
                self._send(200, {"status": "ok", **server.meta})
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802 — stdlib API
            if self.path not in ("/generate", "/v1/completions"):
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                if self.path == "/v1/completions":
                    reqs = _openai_to_requests(payload, default_n)
                    responses = server.serve_requests(
                        reqs, default_new_tokens=default_n)
                    self._send(200, _openai_response(
                        reqs, responses,
                        n_samples=int(payload.get("n", 1))))
                else:
                    requests = (payload["requests"]
                                if "requests" in payload else [payload])
                    responses = server.serve_requests(
                        requests, default_new_tokens=default_n)
                    out = (responses if "requests" in payload
                           else responses[0])
                    self._send(200, {"responses": out}
                               if "requests" in payload else out)
            except Exception as exc:  # serving endpoint: report, don't die
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})
            counter["posts"] += 1

        def log_message(self, fmt, *args):
            print(f"[http] {fmt % args}")

    # online: one handler thread per connection, all submitting into the
    # shared engine — concurrent POSTs join one running device batch
    httpd = (ThreadingHTTPServer if online else HTTPServer)(
        (host, port), Handler)
    bound = httpd.server_address
    print(f"Serving on http://{bound[0]}:{bound[1]} "
          f"(POST /generate, POST /v1/completions, GET /healthz"
          + (", online continuous batching)" if online else ")")
          + (f", exiting after {max_requests} requests" if max_requests
             else ""))
    save_yaml({"host": bound[0], "port": int(bound[1]),
               "artifacts": str(config["artifacts"])},
              output_dir / "serving_info.yaml")
    try:
        if max_requests:
            if online:
                # threaded handlers bump the counter asynchronously; a
                # poll timeout keeps the accept loop from blocking on a
                # connection that will never come after the last POST
                httpd.timeout = 0.2
            while counter["posts"] < max_requests:
                httpd.handle_request()
        else:
            httpd.serve_forever()
    finally:
        httpd.server_close()


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    require_keys(config, ["output_dir", "artifacts"])
    artifacts = Path(config["artifacts"])
    if not (artifacts / "meta.json").exists():
        raise ValueError(f"FATAL: no exported artifacts at {artifacts} "
                         "(expected meta.json + *.stablehlo from "
                         "cli/export_lm.py)")

    output_dir = init_directory(Path(config["output_dir"]),
                                overwrite=overwrite)
    copy_config(config_path, output_dir)

    from tempo_tpu.infer.serving import (ContinuousLMServer, LMServer,
                                         SpeculativeLMServer)

    scheduler = str(config.get("scheduler", "bucketed"))
    chunk = int(config.get("prefill_chunk", 0)) or None
    online = bool(config.get("online", False))
    if online and scheduler not in ("continuous", "paged"):
        raise ValueError("FATAL: online: true is the open-world mode of "
                         "the continuous and paged schedulers")
    if online:
        from tempo_tpu.infer.serving import OnlineLMServer

        # draft_artifacts + k_draft > 0: concurrent callers join one
        # running SPECULATIVE batch (SpecLMEngine / PagedLMEngine
        # behind the front)
        draft = None
        k_draft = int(config.get("k_draft", 0))
        if config.get("draft_artifacts") and k_draft > 0:
            draft = Path(config["draft_artifacts"])
            if not (draft / "meta.json").exists():
                raise ValueError(
                    f"FATAL: no exported draft artifacts at {draft}")
        server = OnlineLMServer(
            artifacts, n_slots=int(config.get("slots", 8)),
            prefill_chunk=chunk,
            k_decode=int(config.get("k_decode", 0)),
            draft_dir=draft, k_draft=k_draft,
            scheduler=scheduler,
            n_pages=int(config.get("n_pages", 0)),
            default_new_tokens=int(config.get("default_n_tokens", 64)))
    elif scheduler == "continuous":
        # draft_artifacts + k_draft > 0 compose speculation into the
        # continuous batch (per-slot draft/verify via `extend_rows`)
        draft = None
        k_draft = int(config.get("k_draft", 0))
        if config.get("draft_artifacts") and k_draft > 0:
            draft = Path(config["draft_artifacts"])
            if not (draft / "meta.json").exists():
                raise ValueError(
                    f"FATAL: no exported draft artifacts at {draft}")
        server = ContinuousLMServer(artifacts,
                                    n_slots=int(config.get("slots", 8)),
                                    prefill_chunk=chunk,
                                    draft_dir=draft, k_draft=k_draft,
                                    k_decode=int(config.get("k_decode", 0)))
    elif scheduler == "speculative":
        require_keys(config, ["draft_artifacts"])
        draft = Path(config["draft_artifacts"])
        if not (draft / "meta.json").exists():
            raise ValueError(f"FATAL: no exported draft artifacts at {draft}")
        server = SpeculativeLMServer(artifacts, draft,
                                     k_draft=int(config.get("k_draft", 4)),
                                     prefill_chunk=chunk)
    elif scheduler == "paged":
        from tempo_tpu.infer.paged import PagedLMServer

        # speculation (draft_artifacts + k_draft) and chunked prefill
        # compose with the paged pool
        draft = None
        k_draft = int(config.get("k_draft", 0))
        if config.get("draft_artifacts") and k_draft > 0:
            draft = Path(config["draft_artifacts"])
            if not (draft / "meta.json").exists():
                raise ValueError(
                    f"FATAL: no exported draft artifacts at {draft}")
        server = PagedLMServer(artifacts,
                               n_slots=int(config.get("slots", 8)),
                               n_pages=int(config.get("n_pages", 0)),
                               k_decode=int(config.get("k_decode", 0)),
                               draft_dir=draft, k_draft=k_draft,
                               prefill_chunk=chunk)
    elif scheduler == "bucketed":
        server = LMServer(artifacts, prefill_chunk=chunk)
    else:
        raise ValueError(f"FATAL: unknown scheduler {scheduler!r} "
                         "(bucketed | continuous | speculative | paged)")
    print(f"Loaded artifacts: vocab {server.vocab}, "
          f"window {server.window}, scheduler {scheduler}, quantize "
          f"{server.meta.get('quantize', 'none')}")

    default_n = int(config.get("default_n_tokens", 64))
    if debug:
        default_n = min(default_n, 8)

    mode = str(config.get("mode", "batch"))
    try:
        if mode == "batch":
            require_keys(config, ["requests"])
            _serve_batch(server, config, output_dir, default_n)
        elif mode == "http":
            _serve_http(server, config, output_dir, default_n,
                        online=online)
        else:
            raise ValueError(
                f"FATAL: unknown mode {mode!r} (batch | http)")
    finally:
        if online:
            server.close()
    print("\nDone!")


if __name__ == "__main__":
    run_cli(main, "Serve exported GPT artifacts (batch JSONL or HTTP)")
