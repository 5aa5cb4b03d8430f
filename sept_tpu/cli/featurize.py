"""CLI: corpus featurization (mirrors
/root/reference/feature_extraction/audio_feature_extraction.py).

    python -m sept_tpu.cli.featurize --dataset synthetic --work_dir work
    python -m sept_tpu.cli.featurize --dataset iemocap --corpus_root /data/IEMOCAP

Decodes audio with the native septio runtime (batch, threaded), featurizes on
TPU as batched GEMM chains, and writes ``<work_dir>/feature/<type>/<dataset>/
data_<len>.npz`` plus the manifest — the npz equivalent of the reference's
``feature/<type>/<dataset>/data_<len>.pkl`` (:191-194).
"""

from __future__ import annotations

import argparse
import os

from sept_tpu.cli.common import add_common_args, setup_seed


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--n_speakers", type=int, default=10,
                   help="synthetic corpus size")
    p.add_argument("--utts_per_speaker", type=int, default=12)
    p.add_argument("--functionals", type=int, default=1,
                   help="also extract the 88-dim gemaps + 988-dim emobase "
                        "functionals (reference extracts both alongside the "
                        "spectral features, audio_feature_extraction.py:188-189); "
                        "0 skips them for runs that train with global_feature=0")
    p.add_argument("--import_opensmile", action="append", default=None,
                   metavar="PATH",
                   help="CSV (openSMILE pandas output) or reference feature "
                        "pickle whose REAL eGeMAPSv02/emobase functionals "
                        "replace this framework's TPU-computed stand-ins in "
                        "the store, verbatim — use when migrating artifacts "
                        "whose --global_feature path must be numerically "
                        "identical to the reference's openSMILE values "
                        "(repeatable; see data/opensmile_import.py)")
    p.add_argument("--decode_chunk", type=int, default=512,
                   help="decode this many files at a time (0 = all at once): "
                        "bounds host memory — decode_batch returns a "
                        "rectangular (chunk, longest) buffer, which at "
                        "whole-corpus scale is GBs — and overlaps the next "
                        "chunk's threaded decode with this chunk's device "
                        "featurization")
    args = p.parse_args(argv)
    setup_seed(args.seed, getattr(args, "prng_impl", None))

    from sept_tpu.data.featurize import featurize_corpus
    from sept_tpu.data.store import save_feature_store, save_manifest

    def featurize(waves):
        return featurize_corpus(
            waves,
            feature_type=args.feature_type,
            feature_len=args.input_spec_size,
            include_gemaps=bool(args.functionals),
        )

    if args.dataset in ("synthetic", "synthetic_hard"):
        from sept_tpu.data.synthetic import make_corpus, make_hard_corpus

        maker = make_hard_corpus if args.dataset == "synthetic_hard" else make_corpus
        corpus = maker(args.n_speakers, args.utts_per_speaker, args.seed)
        manifest = corpus.manifest
        store = featurize(corpus.waveforms)
    else:
        if not args.corpus_root:
            p.error(f"--corpus_root is required for dataset {args.dataset!r}")
        from concurrent.futures import ThreadPoolExecutor

        from sept_tpu.data.walkers import walk_corpus
        from sept_tpu.runtime import decode_batch, narrow_pcm16

        manifest = walk_corpus(args.dataset, args.corpus_root)

        def size_or_zero(path):
            # unstat-able files (dangling symlink, deleted since the walk)
            # must sort somewhere, not crash the run — decode_batch reports
            # them as length-0 rows and they are skipped like any other
            # undecodable file
            try:
                return os.path.getsize(path)
            except OSError:
                return 0

        # size-sorted chunks: files of similar length decode together, so
        # each rectangular decode buffer is tight and the length buckets
        # inside featurize_corpus stay dense
        order = sorted(range(len(manifest)),
                       key=lambda i: size_or_zero(manifest[i].path))
        step = (args.decode_chunk if args.decode_chunk > 0
                else max(1, len(order)))
        chunks = [order[lo : lo + step] for lo in range(0, len(order), step)]

        store = {}
        with ThreadPoolExecutor(max_workers=1) as ex:
            def submit(idxs):
                return ex.submit(
                    decode_batch, [manifest[i].path for i in idxs],
                    target_sr=16000)

            fut = submit(chunks[0]) if chunks else None
            for ci, idxs in enumerate(chunks):
                mat, lens = fut.result()
                if ci + 1 < len(chunks):
                    # prefetch: the C++ decoder releases the GIL, so the
                    # next chunk decodes while this one featurizes on device
                    fut = submit(chunks[ci + 1])
                # narrow_pcm16: decoded 16-bit sources stage to device as
                # int16 (half the H2D bytes, bit-equal features)
                waves = {
                    manifest[i].utt_id: narrow_pcm16(mat[r, : lens[r]])
                    for r, i in enumerate(idxs)
                    if lens[r] > 0
                }
                store.update(featurize(waves))
        manifest = [u for u in manifest if u.utt_id in store]

    if args.import_opensmile:
        from sept_tpu.data.opensmile_import import (
            apply_opensmile,
            load_opensmile_file,
        )

        for path in args.import_opensmile:
            replaced, unmatched, uncovered = apply_opensmile(
                store, load_opensmile_file(path))
            if unmatched:
                p.error(
                    f"--import_opensmile {path}: "
                    f"{len(unmatched)} utterance ids not in this corpus "
                    f"(first: {unmatched[:3]}) — wrong corpus or id scheme?"
                )
            for name, miss in uncovered.items():
                # a partial import silently mixes real openSMILE values
                # with stand-ins (or zeros) — make the gap impossible to
                # miss without blocking intentional partial corpora
                print(
                    f"WARNING: --import_opensmile {path} covers only "
                    f"{len(store) - len(miss)}/{len(store)} utterances for "
                    f"{name!r}; the other {len(miss)} (first: {miss[:3]}) "
                    "keep computed stand-in values and are NOT numerically "
                    "interoperable with reference artifacts"
                )
            print(f"imported {replaced} openSMILE functional vectors "
                  f"from {path}")

    out_dir = os.path.join(args.work_dir, "feature", args.feature_type, args.dataset)
    os.makedirs(out_dir, exist_ok=True)
    store_path = os.path.join(out_dir, f"data_{args.input_spec_size}.npz")
    save_feature_store(store_path, store)
    save_manifest(os.path.join(out_dir, "manifest.json"), manifest)
    print(f"featurized {len(manifest)} utterances -> {store_path}")


if __name__ == "__main__":
    main()
