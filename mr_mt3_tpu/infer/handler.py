"""Transcription inference engine.

Behavior-compatible rebuild of the reference InferenceHandler
(reference: inference.py:20-234), redesigned for TPU execution:

  * the log-mel frontend, encoder, and greedy decode all run on device with
    static shapes — segment batches are padded to a fixed batch size and
    segment counts to a bucket so one compilation serves every song;
  * greedy decode uses the KV-cache while_loop (the reference re-runs the
    full decoder per token with use_cache=False);
  * contiguous (segmem) mode runs the segment chain as an on-device scan
    carrying the previous segment's tokens, instead of a Python loop.

Host side (framing bookkeeping, token postprocess, NoteSequence assembly,
MIDI writing) matches the reference exactly.
"""

from __future__ import annotations

import math
import os
import traceback
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mr_mt3_tpu.audio import (
    SpectrogramConfig,
    compute_logmel,
    normalize_logmel,
)
from mr_mt3_tpu.codec import (
    DECODED_EOS_ID,
    VocabularyConfig,
    build_codec,
    vocabulary_from_codec,
)
from mr_mt3_tpu.codec import note_sequences
from mr_mt3_tpu.codec.combine import event_predictions_to_ns
from mr_mt3_tpu.midi import note_sequence_to_midi_file
from mr_mt3_tpu.models import MT3, MT3Config
from mr_mt3_tpu.ops.decode import greedy_decode, segmem_greedy_decode


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# largest leading-axis size that still pow2-buckets; beyond it shapes
# grow in multiples of 4. serve.py's prewarm derives its bucket
# candidates from this, so the two stay in sync by construction.
POW2_BUCKET_CAP = 64


def _pow2_bucket(n: int, cap: int = POW2_BUCKET_CAP) -> int:
    """Next power of two >= n, for n <= cap; beyond cap, fall back to
    multiples of 4. Variable chain/song counts each compile a distinct
    program (~100 s server-side startup per shape on this platform);
    pow2 bucketing bounds the shapes at log2(cap). The valid-mask makes
    padding rows free in the DECODE loop (they start finished), but they
    still cost encoder FLOPs and host->device transfer — hence the cap:
    the serving/eval coalescing scale (<= 64) is where shape churn
    hurts, while huge one-shot batches compile once anyway and should
    not pay near-2x padding."""
    if n <= 1:
        return 1
    if n > cap:
        return _round_up(n, 4)
    return 1 << int(n - 1).bit_length()


class InferenceHandler:
    """Audio -> MIDI transcription.

    Args:
      model: an MT3 module (vanilla or segmem variant).
      variables: its parameter pytree ({'params': ...}).
      weight_path: alternatively, a reference-format torch checkpoint to load
        into a vanilla MT3 (reference ctor behavior: inference.py:31-42).
      mel_norm: clamp/scale log-mel to [0,1]; off for the official
        checkpoint (reference: test.py:123).
      contiguous_inference: run the whole song as one sequential segment
        chain so segment memory can propagate
        (reference: inference.py:176-181).
      filterbank_style: 'torch' for in-repo models, 'tf' for the official
        checkpoint (reference use_tf_spectral_ops).
    """

    SAMPLE_RATE = 16000

    def __init__(self,
                 model: Optional[MT3] = None,
                 variables=None,
                 weight_path: Optional[str] = None,
                 mel_norm: bool = True,
                 contiguous_inference: bool = False,
                 filterbank_style: str = 'torch',
                 batch_size: int = 8,
                 max_length: int = 1024,
                 segment_bucket: int = 32,
                 quantize: str = 'none',
                 mesh=None,
                 segmem_chain: bool = True,
                 segmem_memory_format: str = 'reference'):
        if model is None:
            model = MT3(MT3Config())
        if variables is None:
            # a provided model without variables loads weight_path into
            # it (previously weight_path was silently ignored when a
            # model was passed, deferring to an opaque crash in decode)
            if weight_path is None:
                raise ValueError('need model+variables or weight_path')
            from mr_mt3_tpu.utils.checkpoint_import import (
                load_torch_checkpoint)
            variables = {
                'params': load_torch_checkpoint(weight_path, model.cfg)}
        self.model = model
        self.variables = variables
        self.cfg = model.cfg
        self.mel_norm = mel_norm
        self.contiguous_inference = contiguous_inference
        # diagnostic ablation: False reseeds the segment memory every
        # segment instead of chaining the previous segment's decode
        # (ops/decode.segmem_greedy_decode chain_memory) — used by
        # benchmarks/dev_segmem_ablation.py to isolate exposure bias
        self.segmem_chain = segmem_chain
        # 'reference' keeps the leading start id in the carried memory
        # (reference decode behavior, shifted one position vs training's
        # targets_prev); 'train_aligned' drops it so decode memory matches
        # the training distribution exactly (ops/decode.py memory_format)
        self.segmem_memory_format = segmem_memory_format
        self.batch_size = batch_size
        self.max_length = max_length
        self.segment_bucket = segment_bucket
        # 'int8': fused Pallas dequant kernels for FF + lm_head weight
        # reads — opt-in MEMORY mode (halves those reads' HBM footprint;
        # measured slower at batch 8, neutral at 64 — PERF.md);
        # 'fused': the whole-decoder Pallas megakernel, int8 weights + KV
        # in one launch per step (small-batch latency mode,
        # ops/fused_decode.py). Both perturb logits slightly.
        # 'fused_bf16': the same megakernel unquantized (bf16 weights/KV,
        # f32 accumulation) — exact-numerics class, a middle tier of
        # the probe ladder (infer/probe.py: int4 -> int8 -> bf16 -> none).
        # 'fused_int4': int4 weights + KV — halves the streamed bytes of
        # the bandwidth-saturated kernel at ~18x int8's rounding error.
        self.quantize = quantize
        # Data-parallel decode over a ('data', 'model') jax mesh: the
        # decode batch (segments / memory chains / lockstep songs) shards
        # over 'data' via shard_map — decode is embarrassingly parallel on
        # that axis, so each chip runs the full local program with ZERO
        # collectives (the megakernel's per-device batch cap then applies
        # per chip). The reference's equivalent evaluates on rank 0 only
        # (reference: tasks/mt3_base.py:27). Scope: a SINGLE-process mesh
        # (one host's chips, e.g. a v5e-8). Multi-host evaluation does
        # NOT need a global mesh here: get_scores shards the SONG list
        # per process and hands each handler a parallel.local_mesh, so
        # every decode program stays single-process (infer/scores.py).
        self.mesh = mesh
        self.n_data = int(mesh.shape['data']) if mesh is not None else 1
        if mesh is not None:
            # NOTE: batch_size itself is never rounded — for segmem
            # models it is the memory-CHAIN length (reference semantics:
            # models/t5_segmem_v2.py:169-233), so changing it would alter
            # tokens vs single-device. Divisibility by the data axis is
            # handled per-path on the sharded axis (device batch, chain
            # count, song count), which carries no semantics.
            from mr_mt3_tpu.parallel.mesh import param_shardings, replicate
            if int(mesh.shape.get('model', 1)) > 1:
                # Tensor-parallel decode (jit+GSPMD, _shard_jit below)
                # cannot partition the quantized Pallas tiers: the
                # megakernel/dequant kernels consume whole weight
                # matrices that TP shards over 'model'. Reject loudly.
                # (The fused full-sequence attention kernel is fine —
                # ops/train_attention.py carries a custom_partitioning
                # rule over its batch/head grid.)
                if self.quantize not in (None, 'none'):
                    raise ValueError(
                        f'quantize={self.quantize!r} is not supported '
                        'with a model axis > 1: the Pallas decode '
                        'kernels read whole weight matrices and cannot '
                        'be GSPMD-partitioned. Use a data-only mesh for '
                        'quantized serving, or quantize=None for TP.')
            # param_shardings applies the TP rules when the model axis is
            # >1 and replicates everything otherwise
            self.variables = jax.device_put(
                self.variables,
                {k: param_shardings(v, mesh) if k == 'params'
                 else replicate(mesh)
                 for k, v in self.variables.items()})
        self.spectrogram_config = SpectrogramConfig(
            filterbank_style=filterbank_style)
        self.codec = build_codec(VocabularyConfig(num_velocity_bins=1))
        self.vocab = vocabulary_from_codec(self.codec)
        self.mel_length = 256

        self._decode_fn = None
        self._segmem_fn = None
        self._segmem_fn_local = None
        # the jitted frontend depends only on spectrogram_config (fixed
        # per handler), so it survives _invalidate_compiled
        self._mel_fn = None

    def _invalidate_compiled(self):
        """Drop every cached compiled decode program. MUST be called
        whenever a field a compiled program bakes in changes (quantize
        tier, max_length) — the probe ladder, serve's prewarm demotion,
        and inference()'s max_length override all route through here so
        a new cached-program attribute only has one site to join."""
        self._decode_fn = None
        self._segmem_fn = None
        self._segmem_fn_local = None

    # ---- host-side preprocessing (reference: inference.py:64-127) ----

    def _audio_to_segments(self, audio: np.ndarray):
        """Frame and split audio into zero-padded (N, mel_length*hop) chunks.

        Returns (segment_samples (N, 32768), frame_times (N, 256),
        valid_frames per segment).
        """
        hop = self.spectrogram_config.hop_width
        pad = hop - len(audio) % hop
        audio = np.pad(audio, (0, pad))
        num_frames = len(audio) // hop
        times = np.arange(num_frames) / self.spectrogram_config.frames_per_second

        seg_frames = self.mel_length
        num_segments = math.ceil(num_frames / seg_frames)
        seg_samples = seg_frames * hop
        segments = np.zeros((num_segments, seg_samples), dtype=np.float32)
        seg_times = np.zeros((num_segments, seg_frames))
        valid = []
        for i in range(num_segments):
            f0 = i * seg_frames
            f1 = min(f0 + seg_frames, num_frames)
            n = f1 - f0
            segments[i, :n * hop] = audio[f0 * hop:f1 * hop]
            seg_times[i, :n] = times[f0:f1]
            valid.append(n)
        return segments, seg_times, valid

    def _compute_mel(self, segments: np.ndarray, valid: List[int]):
        """Segments -> log-mel, returned as a DEVICE array.

        Mel stays device-resident from here through decode: the decode
        paths slice/pad it with jnp ops, so the only host->device upload
        per request is the raw segment audio (~16x smaller than mel).
        The whole frontend is one jitted program — eager calls would
        re-upload the 2 MB mel filterbank constant every time, where the
        jit bakes it into the compiled program once. Besides the
        transfer saving, the tunneled dev TPU platform leaks the host
        staging copy of EVERY upload (measured ~bytes-uploaded per call
        — PERF.md 'platform quirks'), so the eager constant re-uploads
        and a mel host round trip would also leak ~4 MB per serving
        request. mel_norm is a traced flag so both settings share one
        program (tests toggle it on a live handler)."""
        if self._mel_fn is None:
            sc = self.spectrogram_config

            def mel_fn(segments, n_valid, norm):
                mel = compute_logmel(segments, sc)
                mel = jnp.where(norm, normalize_logmel(mel), mel)
                # zero padded tail frames (reference: inference.py:125-127)
                frames = jnp.arange(mel.shape[1])[None, :, None]
                return jnp.where(frames < n_valid[:, None, None], mel, 0.0)
            self._mel_fn = jax.jit(mel_fn)
        return self._mel_fn(jnp.asarray(segments),
                            jnp.asarray(np.asarray(valid, np.int32)),
                            bool(self.mel_norm))

    # ---- device-side decode ----

    def _shard_jit(self, fn):
        """jit `fn(variables, mel, valid_mask)`; with a mesh, shard_map it
        over 'data' so each chip decodes its slice of the leading batch
        axis as a full local program (KV-cache while_loop, Pallas kernels
        and all) with no cross-chip communication. The valid mask shards
        WITH the batch so each chip sees its own padding rows. Callers pad
        leading dims to multiples of the data-axis size."""
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        if int(self.mesh.shape.get('model', 1)) > 1:
            # tensor-parallel: shard_map can't express intra-op model
            # parallelism, so jit with explicit input shardings and let
            # GSPMD partition the matmuls over 'model' (one all-reduce
            # per attention/FFN pair, per the training TP rules) while
            # the batch still splits over 'data'. self.variables was
            # placed by param_shardings in __init__; passing its live
            # shardings through keeps placement and partitioning agreed.
            var_shardings = jax.tree.map(lambda a: a.sharding,
                                         self.variables)
            data = NamedSharding(self.mesh, P('data'))
            return jax.jit(fn, in_shardings=(var_shardings, data, data),
                           out_shardings=data)
        # check_vma off: zero-initialized carries (KV caches) start
        # replicated and become data-varying after the first update, which
        # the static vma checker rejects; the body has no collectives
        mapped = jax.shard_map(fn, mesh=self.mesh,
                               in_specs=(P(), P('data'), P('data')),
                               out_specs=P('data'), check_vma=False)
        return jax.jit(mapped)

    @staticmethod
    def _mask(n_valid: int, total: int) -> jnp.ndarray:
        """True for real rows, False for batch padding — padding rows
        start decode finished so they never block the all-finished early
        exit."""
        return jnp.arange(total) < n_valid

    def _call_sizes(self, n_real: int, floor: int,
                    capped: bool) -> list:
        """Device-call sizes for a leading axis of n_real rows: one
        pow2-bucketed call normally; under the fused per-call cap,
        full-cap calls plus a pow2-bucketed remainder (so the remainder
        reuses standard bucket shapes instead of padding the whole batch
        to a cap multiple). Every size is a multiple of the data axis.

        The cap is encoder-length-aware: short-encoder calls take the
        64-row compile ceiling (in-trace groups-of-8 IMPROVE aggregate
        throughput there, 148 -> 203 RTF — PERF.md), but at the segmem
        encoder-append shape (Lenc=320, cache chunk 512) grouping HURTS
        — measured 195.2 RTF per 8-row call vs 188.6 at 4 groups and
        167.6 at 8 groups (benchmarks/dev_fused_vmem_unlock.py), the
        bigger-VMEM kernels leaving XLA no room to overlap group work —
        so those calls stay single-group."""
        def bucket(n):
            return _round_up(max(floor, _pow2_bucket(n)), self.n_data)
        if not capped:
            return [bucket(n_real)]
        from mr_mt3_tpu.ops.fused_decode import FUSED_MAX_BATCH
        rows = (FUSED_MAX_BATCH
                if self.cfg.segmem_variant == 'encoder_append'
                else 8 * FUSED_MAX_BATCH)
        cap = rows * self.n_data
        if bucket(n_real) <= cap:
            return [bucket(n_real)]
        sizes = [cap] * (n_real // cap)
        rem = n_real % cap
        if rem:
            # pow2-bucketing then rounding up to n_data can exceed the
            # cap on non-pow2 meshes (rem=40, n_data=6: bucket -> 66 >
            # cap 48); the per-call cap is hard (kernel grouping fails
            # above it), so clamp the remainder to one full-cap call —
            # cap is itself a multiple of n_data and an already-warmed
            # shape
            sizes.append(min(bucket(rem), cap))
        return sizes

    def _call_in_sizes(self, fn, stacked: np.ndarray, sizes: list,
                       n_real: int) -> np.ndarray:
        """Run fn(variables, slice, mask) over consecutive slices of
        `sizes` (stacked rows beyond n_real are padding)."""
        if len(sizes) == 1:
            return np.asarray(fn(self.variables, jnp.asarray(stacked),
                                 self._mask(n_real, stacked.shape[0])))
        parts, off = [], 0
        for size in sizes:
            real = max(0, min(size, n_real - off))
            parts.append(np.asarray(fn(
                self.variables, jnp.asarray(stacked[off:off + size]),
                self._mask(real, size))))
            off += size
        return np.concatenate(parts)

    def _get_decode_fn(self):
        if self._decode_fn is None:
            model, max_length = self.model, self.max_length
            quantize = self.quantize

            def fn(variables, mel, valid_mask):
                return greedy_decode(model, variables, mel, max_length,
                                     quantize=quantize,
                                     valid_mask=valid_mask)
            self._decode_fn = self._shard_jit(fn)
        return self._decode_fn

    def _get_segmem_fn(self, local: bool = False):
        """local=True returns an unsharded fn even under a mesh — used for
        single-song contiguous decode, where padding the song axis to the
        data-axis size would transfer (and decode) n_data-1 silent songs
        for zero wall-clock gain (the chain is sequential)."""
        attr = '_segmem_fn_local' if (local and self.mesh is not None) \
            else '_segmem_fn'
        if getattr(self, attr) is None:
            model, max_length = self.model, self.max_length
            codec, vocab = self.codec, self.vocab
            quantize = self.quantize
            chain = self.segmem_chain
            memory_format = self.segmem_memory_format

            def fn(variables, mel_segments, valid_mask):
                return segmem_greedy_decode(model, variables, mel_segments,
                                            max_length,
                                            codec=codec, vocab=vocab,
                                            quantize=quantize,
                                            valid_mask=valid_mask,
                                            chain_memory=chain,
                                            memory_format=memory_format)
            setattr(self, attr, jax.jit(fn) if attr == '_segmem_fn_local'
                    else self._shard_jit(fn))
        return getattr(self, attr)

    def _decode_all(self, mel: np.ndarray) -> np.ndarray:
        """mel (N, 256, 512) -> model-space tokens (N, max_length + 1)."""
        n = mel.shape[0]
        mel = jnp.asarray(mel)  # no-op for the device-resident mel path
        if self.contiguous_inference:
            bucket = max(self.segment_bucket, 1)
            padded = _round_up(n, bucket)
            # a lone song cannot use the data axis (its chain is
            # sequential); decode it unsharded instead of padding the song
            # axis with n_data-1 silent songs (which would transfer and
            # decode pure zeros). transcribe_many is where chips win.
            mel_p = jnp.pad(mel, ((0, padded - n), (0, 0), (0, 0)))[None]
            fn = self._get_segmem_fn(local=True)
            tokens = np.asarray(fn(self.variables, mel_p,
                                   self._mask(1, 1)))[0]
            return tokens[:n]
        if self.cfg.segmem_variant == 'encoder_append':
            return self._decode_segmem_chained([mel])[0]
        # any batch size works in fused mode too: greedy_loop_fused
        # splits >8-row batches into groups-of-8 inside one trace
        # (aggregate throughput IMPROVES with batch — PERF.md), up to
        # the 8-group / 64-row per-call compile ceiling. Under a mesh,
        # batch_size is PER CHIP (like DDP's per-rank batch): each chip
        # decodes batch_size rows, so chips scale throughput instead of
        # splitting a fixed batch into idle slivers. Vanilla segments are
        # independent — unlike the segmem chain paths, this grouping has
        # no semantics.
        b = self.batch_size * self.n_data
        if self.quantize.startswith('fused'):
            from mr_mt3_tpu.ops.fused_decode import FUSED_MAX_BATCH
            b = min(b, 8 * FUSED_MAX_BATCH * self.n_data)
        outs = []
        for start in range(0, n, b):
            chunk = mel[start:start + b]
            real = chunk.shape[0]
            if real < b:
                chunk = jnp.pad(chunk, ((0, b - real), (0, 0), (0, 0)))
            fn = self._get_decode_fn()
            tokens = np.asarray(fn(self.variables, chunk,
                                   self._mask(real, b)))
            outs.append(tokens)
        return np.concatenate(outs)[:n]

    def _decode_segmem_chained(self, mels: List[np.ndarray]) -> List[np.ndarray]:
        """Non-contiguous decode for encoder_append segmem models.

        The reference's v2/with-prev generate() chains segment memory across
        the rows of EVERY decode batch, even without contiguous_inference —
        each batch of `batch_size` segments is a fresh sequential chain with
        the standard memory seed (reference: models/t5_segmem_v2.py:169-233,
        t5_segmem_v2_with_prev.py:226-297). Here each song's segments are cut
        into chains of `batch_size`, and ALL chains (across songs) run as one
        lockstep scan: batch axis = chains, scan axis = chain position.
        Tail padding sits at chain ends, so it never pollutes real memory;
        chains never cross song boundaries.
        """
        b = self.batch_size
        chains = []   # per song: (n_segments, first_chain_idx, num_chains)
        all_chunks = []
        for mel in mels:
            mel = jnp.asarray(mel)
            n = mel.shape[0]
            num_chunks = math.ceil(n / b)
            mel_p = jnp.pad(mel, ((0, num_chunks * b - n), (0, 0), (0, 0)))
            chains.append((n, len(all_chunks), num_chunks))
            all_chunks.extend(mel_p.reshape((num_chunks, b) + mel.shape[1:]))
        # pow2 shape bucketing (see _pow2_bucket); with a mesh the chain
        # axis also tiles 'data'. Fused mode splits past the per-call cap
        # (_call_sizes: 8 rows for these encoder_append chains — in-trace
        # grouping loses at the chunk-512 segmem shape) with full-cap
        # device calls plus a pow2-bucketed remainder call (the remainder
        # reuses the standard bucket shapes instead of padding the whole
        # batch up to a cap multiple).
        n_real = len(all_chunks)
        capped = self.quantize.startswith('fused')
        sizes = self._call_sizes(n_real, floor=4, capped=capped)
        padded_chains = sum(sizes)
        stacked = jnp.stack(all_chunks)
        if padded_chains > n_real:
            stacked = jnp.pad(
                stacked,
                ((0, padded_chains - n_real), (0, 0), (0, 0), (0, 0)))
        fn = self._get_segmem_fn()
        tokens = self._call_in_sizes(fn, stacked, sizes, n_real)
        out = []
        for n, start, num_chunks in chains:
            flat = tokens[start:start + num_chunks].reshape(
                num_chunks * b, -1)
            out.append(flat[:n])
        return out

    # ---- host-side postprocess (reference: inference.py:206-234) ----

    def _postprocess(self, tokens: np.ndarray) -> np.ndarray:
        """Model tokens -> codec tokens: EOS-and-after -> -1, strip the
        special offset, drop the start token."""
        after_eos = np.cumsum(tokens == self.cfg.eos_token_id, axis=-1)
        out = tokens - self.vocab.num_special_tokens()
        out = np.where(after_eos > 0, DECODED_EOS_ID, out)
        return out[:, 1:]

    def _to_note_sequence(self, tokens: np.ndarray, seg_times: np.ndarray):
        predictions = []
        for i, row in enumerate(tokens):
            # trim at the first EOS marker; np.argmax semantics match the
            # reference (no EOS -> argmax 0 -> empty tokens)
            row = row[:np.argmax(row == DECODED_EOS_ID)]
            start_time = seg_times[i][0]
            start_time -= start_time % (1 / self.codec.steps_per_second)
            predictions.append({
                'est_tokens': row,
                'start_time': start_time,
                'raw_inputs': [],
            })
        result = event_predictions_to_ns(
            predictions, codec=self.codec,
            encoding_spec=note_sequences.NoteEncodingWithTiesSpec)
        return result['est_ns']

    # ---- public API ----

    def transcribe(self, audio: np.ndarray) -> note_sequences.NoteSequence:
        """16 kHz mono audio -> NoteSequence."""
        segments, seg_times, valid = self._audio_to_segments(
            np.asarray(audio, dtype=np.float32))
        mel = self._compute_mel(segments, valid)
        tokens = self._decode_all(mel)
        codec_tokens = self._postprocess(tokens)
        return self._to_note_sequence(codec_tokens, seg_times)

    def transcribe_many(self, audios) -> list:
        """Transcribe several songs with cross-song batching.

        In contiguous (segmem) mode songs run in lockstep through one
        segment-axis scan — each song's memory chain stays sequential while
        the batch dimension carries the songs (the reference can only loop
        one segment at a time: models/t5_segmem_v2_with_prev.py:241-294).
        Non-contiguous mode concatenates all songs' segments into fixed
        decode batches. Outputs are identical to per-song transcribe().
        """
        pre = [self._audio_to_segments(np.asarray(a, dtype=np.float32))
               for a in audios]
        mels = [self._compute_mel(segments, valid)
                for segments, _, valid in pre]

        if self.contiguous_inference:
            bucket = max(self.segment_bucket, 1)
            max_s = _round_up(max(m.shape[0] for m in mels), bucket)
            stacked = jnp.stack([
                jnp.pad(jnp.asarray(m),
                        ((0, max_s - m.shape[0]), (0, 0), (0, 0)))
                for m in mels])
            # pow2 song bucketing (one compiled shape per bucket; padded
            # songs are masked and cost zero decode steps) + the mesh's
            # data-axis tiling; fused mode splits past the per-call cap
            # (_call_sizes: 8 songs for encoder_append lockstep, 64 rows
            # otherwise) with a pow2-bucketed remainder
            n_songs = len(mels)
            capped = self.quantize.startswith('fused')
            sizes = self._call_sizes(n_songs, floor=1, capped=capped)
            target_songs = sum(sizes)
            if target_songs != stacked.shape[0]:
                pad_songs = target_songs - stacked.shape[0]
                stacked = jnp.pad(
                    stacked,
                    ((0, pad_songs), (0, 0), (0, 0), (0, 0)))
            fn = self._get_segmem_fn()
            tokens = self._call_in_sizes(fn, stacked, sizes, n_songs)
            per_song = [tokens[i, :m.shape[0]]
                        for i, m in enumerate(mels)]
        elif self.cfg.segmem_variant == 'encoder_append':
            # per-song memory chains, batched across songs in lockstep
            per_song = self._decode_segmem_chained(mels)
        else:
            all_mel = jnp.concatenate([jnp.asarray(m) for m in mels],
                                      axis=0)
            all_tokens = self._decode_all(all_mel)
            per_song, start = [], 0
            for m in mels:
                per_song.append(all_tokens[start:start + m.shape[0]])
                start += m.shape[0]

        results = []
        for tokens, (_, seg_times, _) in zip(per_song, pre):
            codec_tokens = self._postprocess(tokens)
            results.append(self._to_note_sequence(codec_tokens, seg_times))
        return results

    def inference(self, audio, audio_path: str = '', outpath=None,
                  valid_programs=None, num_beams: int = 1,
                  batch_size: Optional[int] = None,
                  max_length: Optional[int] = None,
                  verbose: bool = False) -> Optional[
                      note_sequences.NoteSequence]:
        """Transcribe and write a MIDI file (reference signature:
        inference.py:149-204; errors are caught and printed the same way).
        num_beams is accepted for API parity; decoding is greedy, exactly
        like the reference's custom generate which ignores beam kwargs."""
        if batch_size is not None:
            self.batch_size = batch_size
        if max_length is not None and max_length != self.max_length:
            self.max_length = max_length
            self._invalidate_compiled()
        try:
            ns = self.transcribe(audio)
            if outpath is None:
                filename = os.path.basename(str(audio_path)).split('.')[0]
                outpath = f'./out/{filename}.mid'
            parent = os.path.dirname(str(outpath))
            if parent:
                os.makedirs(parent, exist_ok=True)
            if verbose:
                print('saving', outpath)
            note_sequence_to_midi_file(ns, outpath)
            return ns
        except Exception:
            traceback.print_exc()
            return None

    def _get_program_ids(self, valid_programs) -> List[List[int]]:
        """Model-space ids of invalid programs (reference: inference.py:138-147;
        computed for API parity — the reference never applies them)."""
        min_program_id, max_program_id = self.codec.event_type_range(
            'program')
        total = max_program_id - min_program_id
        invalid = [min_program_id + p for p in range(total)
                   if p not in valid_programs]
        return [[p] for p in self.vocab.encode(invalid)]
