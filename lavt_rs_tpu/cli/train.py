"""Training entry point — the reference train.py equivalent.

Single jitted program per step over a data mesh (no torch.distributed
launcher: multi-chip = same script under `jax.distributed.initialize`).
The flag surface replicates the reference's parser (args.py:4-255) via
cli/args.py, so reference command lines work unchanged, e.g. the
README.md:167 RefCOCO recipe:

  python -m lavt_rs_tpu.cli.train --dataset refcoco --model lavt_one \
      --swin_type base --window12 --lr 0.00005 --wd 1e-2 -b 32 \
      --epochs 40 --refer_data_root ./refer/data --vocab ./vocab.txt \
      --output-dir ./checkpoints

Use --synthetic to smoke-run the full loop without data on disk.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .args import (add_data_args, add_eval_args, add_model_args,
                   add_train_args, model_config_from_args,
                   train_config_from_args)


def get_parser():
    p = argparse.ArgumentParser("lavt_rs_tpu training")
    add_model_args(p)
    add_data_args(p)
    add_train_args(p)
    add_eval_args(p)
    return p


def synthetic_batches(args, steps, rng, video: bool = False,
                      vocab_size: int = 30522):
    # ids must stay in-vocab: flax Embed gathers with NaN fill for
    # out-of-bounds indices, which poisons the whole loss.
    hi = min(30000, vocab_size - 1)
    for _ in range(steps):
        batch = {
            "ids": rng.integers(
                1, hi, (args.batch_size, args.max_tokens)
            ).astype(np.int32),
            "mask": np.ones((args.batch_size, args.max_tokens), np.int32),
            "target": rng.integers(
                0, 2, (args.batch_size, args.img_size, args.img_size)
            ).astype(np.int32),
        }
        if video:
            batch["video"] = rng.standard_normal(
                (args.batch_size, args.num_frames, args.img_size,
                 args.img_size, 3)).astype(np.float32)
            batch["valid_index"] = rng.integers(
                0, args.num_frames, (args.batch_size,)).astype(np.int32)
        else:
            batch["image"] = rng.standard_normal(
                (args.batch_size, args.img_size, args.img_size, 3)
            ).astype(np.float32)
        yield batch


def main(argv=None):
    args = get_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models.factory import build_model
    from ..parallel.mesh import make_mesh, replicate, shard_batch
    from ..train.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
    from ..train.optim import TrainConfig
    from ..train.step import create_train_state, make_train_step

    cfg = model_config_from_args(args)
    args.max_tokens = cfg.max_tokens
    model = build_model(cfg, train=True)
    rng = np.random.default_rng(args.seed)

    video = cfg.name == "lavt_video"

    # data
    if args.synthetic:
        iters_per_epoch = args.synthetic_steps

        def epoch_batches(epoch):
            return synthetic_batches(args, args.synthetic_steps, rng,
                                     video=video,
                                     vocab_size=cfg.bert.vocab_size)
    elif video:
        from ..text.tokenizer import WordPieceTokenizer

        tok = WordPieceTokenizer.from_vocab_file(args.vocab)
        if args.dataset == "a2d":
            from ..data.a2d import A2DSentencesDataset

            train_ds = A2DSentencesDataset(
                args.a2d_data_root, args.a2d_ann, tok, subset="train",
                num_frames=args.num_frames, clip_length=args.clip_length,
                img_size=args.img_size, max_tokens=args.max_tokens)
        elif args.dataset == "ytvos":
            from ..data.ytvos import YTVOSDataset

            train_ds = YTVOSDataset(
                args.ytvos_data_root, args.ytvos_ann, tok,
                num_frames=args.num_frames, img_size=args.img_size,
                max_tokens=args.max_tokens)
        elif args.dataset in ("ref_pseudo_video", "joint") or \
                args.image_combined_3d_pretrain:
            # RefCOCO images as augmented pseudo-clips; combined-3D
            # pretraining concatenates the 3 RefCOCO-family datasets
            # (reference --image_combined_3d_pretrain), and `joint` adds
            # YTVOS on top (reference data/concat_dataset.py:17-33).
            from ..data.pseudo_video import (ConcatDataset,
                                             ImageToSeqAugmenter,
                                             ReferPseudoVideos)
            from ..data.refer import REFER

            combined = (args.dataset == "joint"
                        or args.image_combined_3d_pretrain)
            sources = ((("refcoco", "unc"), ("refcoco+", "unc"),
                        ("refcocog", "umd")) if combined
                       else (("refcoco", args.splitBy),))
            parts = []
            for name, sb in sources:
                refer = REFER(args.refer_data_root, name, sb)
                parts.append(ReferPseudoVideos(
                    refer, tok, split=args.split,
                    num_frames=args.num_frames, img_size=args.img_size,
                    max_tokens=args.max_tokens,
                    augmenter=ImageToSeqAugmenter(seed=args.seed)))
            if args.dataset == "joint":
                from ..data.ytvos import YTVOSDataset

                parts.append(YTVOSDataset(
                    args.ytvos_data_root, args.ytvos_ann, tok,
                    num_frames=args.num_frames, img_size=args.img_size,
                    max_tokens=args.max_tokens))
            train_ds = parts[0] if len(parts) == 1 else ConcatDataset(parts)
        else:
            raise ValueError(f"unknown video dataset {args.dataset}")
        iters_per_epoch = len(train_ds) // args.batch_size

        def epoch_batches(epoch):
            order = np.random.default_rng(args.seed + epoch).permutation(
                len(train_ds))
            bsz = args.batch_size
            for s in range(0, len(order) - bsz + 1, bsz):
                items = [train_ds[int(i)] for i in order[s:s + bsz]]
                yield {
                    "video": np.stack([it.video for it in items]),
                    "target": np.stack([it.target for it in items]),
                    "ids": np.stack([it.ids for it in items]).astype(np.int32),
                    "mask": np.stack([it.mask for it in items]).astype(np.int32),
                    "valid_index": np.asarray(
                        [it.valid_index for it in items], np.int32),
                }
    else:
        from ..data.refer import REFER
        from ..data.refcoco import ReferDataset, batch_iterator
        from ..text.tokenizer import WordPieceTokenizer

        refer = REFER(args.refer_data_root, args.dataset, args.splitBy)
        tok = WordPieceTokenizer.from_vocab_file(args.vocab)
        if args.ref_image_combined_pretrain:
            # reference: the 3 RefCOCO-family datasets concatenated, 22
            # tokens (data/dataset_refer_bert.py:39-42)
            from ..data.pseudo_video import ConcatDataset

            parts = []
            for name, sb in (("refcoco", "unc"), ("refcoco+", "unc"),
                             ("refcocog", "umd")):
                r = REFER(args.refer_data_root, name, sb)
                parts.append(ReferDataset(r, tok, split=args.split,
                                          img_size=args.img_size,
                                          max_tokens=22))
            train_ds = ConcatDataset(parts)
        else:
            train_ds = ReferDataset(refer, tok, split=args.split,
                                    img_size=args.img_size,
                                    max_tokens=args.max_tokens)
        val_ds = ReferDataset(refer, tok, split=args.val_split,
                              img_size=args.img_size,
                              max_tokens=args.max_tokens, eval_mode=True)
        iters_per_epoch = len(train_ds) // args.batch_size

        def epoch_batches(epoch):
            return batch_iterator(train_ds, args.batch_size, shuffle=True,
                                  seed=args.seed + epoch)

    tcfg = train_config_from_args(args, max(iters_per_epoch, 1))

    # init
    b0 = {k: v[:1] for k, v in next(iter(epoch_batches(0))).items()}
    vis0 = b0["video"] if video else b0["image"]
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), jnp.asarray(vis0),
        jnp.asarray(b0["ids"]), jnp.asarray(b0["mask"]))

    # pretrained-weight imports (the reference's 5 init flags; each merges
    # a converted partial tree non-strictly into the fresh init)
    import os as _os

    if (args.pretrained_swin_weights or args.pretrained2d_lavt_weights
            or args.pretrained2d_lavt_weights_for_a_3d_model
            or args.pretrained_video_lavt_weights_on_refcocos
            or (args.ck_bert and _os.path.isfile(args.ck_bert))):
        from ..convert.pretrained import apply_pretrained_flags

        variables = jax.tree.map(
            jnp.asarray, apply_pretrained_flags(variables, cfg, args))

    state, tx = create_train_state(model, variables, tcfg)
    start_epoch = 0
    if args.resume:
        import os

        # --resume accepts either a specific epoch_NNNN checkpoint dir or a
        # checkpoint parent dir (newest is taken).
        path = (args.resume
                if os.path.basename(os.path.normpath(args.resume)
                                    ).startswith("epoch_")
                else latest_checkpoint(args.resume))
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {args.resume}")
        state, _, resume_epoch = restore_checkpoint(path, state)
        # continue AFTER the saved epoch (reference train.py:738
        # `range(max(0, resume_epoch+1), epochs)`)
        start_epoch = resume_epoch + 1
        print(f"resumed from {path}; continuing at epoch {start_epoch}",
              file=sys.stderr)

    mesh = make_mesh()
    state = replicate(mesh, state)
    if video:
        from ..train.step import make_video_train_step

        step_fn = jax.jit(make_video_train_step(model, tx, tcfg),
                          donate_argnums=(0,))
    else:
        step_fn = jax.jit(make_train_step(model, tx, tcfg),
                          donate_argnums=(0,))
    key = jax.random.PRNGKey(args.seed + 1)

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses = []
        for it, batch in enumerate(epoch_batches(epoch)):
            batch.pop("ref_id", None)
            batch = shard_batch(mesh, batch)
            state, metrics = step_fn(state, batch, key)
            if (it + 1) % args.print_freq == 0 or args.synthetic:
                loss = float(metrics["loss"])
                losses.append(loss)
                print(f"epoch {epoch} [{it + 1}/{iters_per_epoch}] "
                      f"loss={loss:.4f} iou={float(metrics['iou']):.4f} "
                      f"lr={float(metrics['lr']):.2e}", file=sys.stderr)
        print(f"epoch {epoch} done in {time.time() - t0:.1f}s",
              file=sys.stderr)

        # validation every epoch, like the reference (train.py:743); the
        # checkpoint is named with its metrics (train.py:761-762).
        tag = ""
        if (not args.synthetic and not video
                and (epoch + 1) % max(args.eval_every, 1) == 0):
            from ..eval.refcoco_eval import evaluate
            from ..models.factory import build_model as _bm

            eval_model = _bm(cfg, train=False)
            eval_vars = {"params": jax.device_get(state.params),
                         "batch_stats": jax.device_get(state.batch_stats)}
            summary = evaluate(
                lambda v, *a: eval_model.apply(v, *a), eval_vars, val_ds,
                log_every=0)
            tag = (f"mIoU_{summary['mIoU']:.2f}"
                   f"_oIoU_{summary['oIoU']:.2f}")

        if args.output_dir:
            save_checkpoint(args.output_dir, epoch, state,
                            extra={"args": vars(args)}, metrics_tag=tag,
                            keep=args.keep_checkpoints or None)
    print("training complete", file=sys.stderr)


if __name__ == "__main__":
    main()
