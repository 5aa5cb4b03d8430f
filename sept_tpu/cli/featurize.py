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
    args = p.parse_args(argv)
    setup_seed(args.seed)

    from sept_tpu.data.featurize import featurize_corpus
    from sept_tpu.data.store import save_feature_store, save_manifest

    if args.dataset in ("synthetic", "synthetic_hard"):
        from sept_tpu.data.synthetic import make_corpus, make_hard_corpus

        maker = make_hard_corpus if args.dataset == "synthetic_hard" else make_corpus
        corpus = maker(args.n_speakers, args.utts_per_speaker, args.seed)
        manifest, waveforms = corpus.manifest, corpus.waveforms
    else:
        if not args.corpus_root:
            p.error(f"--corpus_root is required for dataset {args.dataset!r}")
        from sept_tpu.data.walkers import walk_corpus
        from sept_tpu.runtime import decode_batch, narrow_pcm16

        manifest = walk_corpus(args.dataset, args.corpus_root)
        paths = [u.path for u in manifest]
        mat, lens = decode_batch(paths, target_sr=16000)
        # narrow_pcm16: decoded 16-bit sources stage to device as int16
        # (half the H2D bytes, bit-equal features — wavio.narrow_pcm16)
        waveforms = {
            u.utt_id: narrow_pcm16(mat[i, : lens[i]])
            for i, u in enumerate(manifest)
            if lens[i] > 0
        }
        manifest = [u for i, u in enumerate(manifest) if lens[i] > 0]

    store = featurize_corpus(
        waveforms,
        feature_type=args.feature_type,
        feature_len=args.input_spec_size,
        include_gemaps=bool(args.functionals),
    )

    out_dir = os.path.join(args.work_dir, "feature", args.feature_type, args.dataset)
    os.makedirs(out_dir, exist_ok=True)
    store_path = os.path.join(out_dir, f"data_{args.input_spec_size}.npz")
    save_feature_store(store_path, store)
    save_manifest(os.path.join(out_dir, "manifest.json"), manifest)
    print(f"featurized {len(manifest)} utterances -> {store_path}")


if __name__ == "__main__":
    main()
