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


class _SizedIter:
    """Wrap a generator with a known length so MetricLogger.log_every can
    print [i/n] + ETA (PrefetchLoader has __len__, generators don't)."""

    def __init__(self, it, n):
        self._it, self._n = iter(it), n

    def __iter__(self):
        return self._it

    def __len__(self):
        return self._n


def main(argv=None):
    args = get_parser().parse_args(argv)

    if getattr(args, "jax_distributed", False):
        # multi-host pods: one process per host, GSPMD over the global
        # mesh (reference: torch.distributed.launch + NCCL init,
        # utils.py:215-232)
        import jax

        jax.distributed.initialize()

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
        from ..text.tokenizer import WordPieceTokenizer, resolve_vocab

        tok = WordPieceTokenizer.from_vocab_file(
            resolve_vocab(args.vocab, args.bert_tokenizer))
        if args.dataset == "a2d":
            from ..data.a2d import A2DSentencesDataset

            train_ds = A2DSentencesDataset(
                args.a2d_data_root, args.a2d_ann, tok, subset="train",
                num_frames=args.num_frames, clip_length=args.clip_length,
                img_size=args.img_size, max_tokens=args.max_tokens,
                host_normalize=False)
        elif args.dataset == "ytvos":
            from ..data.ytvos import YTVOSDataset

            train_ds = YTVOSDataset(
                args.ytvos_data_root, args.ytvos_ann, tok,
                num_frames=args.num_frames, img_size=args.img_size,
                max_tokens=args.max_tokens, host_normalize=False)
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
            import os as _os

            for name, sb in sources:
                refexp_ann = _os.path.join(
                    args.refer_data_root, name,
                    f"instances_{name}_{args.split}.json")
                if _os.path.exists(refexp_ann):
                    # COCO-format refexp jsons (the reference's
                    # ModulatedDetection source, data/refexp2seq.py:278-298)
                    from ..data.refexp2seq import build_refexp_dataset

                    parts.append(build_refexp_dataset(
                        name, args.split, args.refer_data_root, tok,
                        num_frames=args.num_frames, img_size=args.img_size,
                        max_tokens=args.max_tokens, seed=args.seed,
                        host_normalize=False))
                else:
                    refer = REFER(args.refer_data_root, name, sb)
                    parts.append(ReferPseudoVideos(
                        refer, tok, split=args.split,
                        num_frames=args.num_frames, img_size=args.img_size,
                        max_tokens=args.max_tokens,
                        augmenter=ImageToSeqAugmenter(seed=args.seed),
                        host_normalize=False))
            if args.dataset == "joint":
                from ..data.ytvos import YTVOSDataset

                parts.append(YTVOSDataset(
                    args.ytvos_data_root, args.ytvos_ann, tok,
                    num_frames=args.num_frames, img_size=args.img_size,
                    max_tokens=args.max_tokens, host_normalize=False))
            train_ds = parts[0] if len(parts) == 1 else ConcatDataset(parts)
        else:
            raise ValueError(f"unknown video dataset {args.dataset}")

        # validation dataset for per-epoch video eval (reference
        # train.py:768-789 evaluate_a2d / evaluate_ref_3d; YTVOS trains
        # blind — the competition split is server-scored)
        val_ds = None
        if args.dataset == "a2d":
            from ..data.a2d import A2DSentencesDataset

            val_ds = A2DSentencesDataset(
                args.a2d_data_root, args.a2d_ann, tok, subset=args.val_split,
                num_frames=args.num_frames, clip_length=args.clip_length,
                img_size=args.img_size, max_tokens=args.max_tokens,
                host_normalize=False,
                not_consecutive=args.not_consecutive)
        elif args.dataset == "ref_pseudo_video" or \
                args.image_combined_3d_pretrain:
            # evaluate_ref_3d equivalent: RefCOCO val refs as static
            # pseudo-clips through the 3D model (reference train.py:794-811)
            refer_val = REFER(args.refer_data_root, "refcoco",
                              "unc" if combined else args.splitBy)
            val_ds = ReferPseudoVideos(
                refer_val, tok, split=args.val_split,
                num_frames=args.num_frames, img_size=args.img_size,
                max_tokens=args.max_tokens, host_normalize=False)

        from ..data.loader import PrefetchLoader, collate_video

        loader = PrefetchLoader(train_ds, args.batch_size, collate_video,
                                shuffle=True, num_workers=args.workers,
                                seed=args.seed,
                                shard_index=jax.process_index(),
                                num_shards=jax.process_count())
        iters_per_epoch = len(loader)

        def epoch_batches(epoch):
            loader.set_epoch(epoch)
            return iter(loader)
    else:
        from ..data.refer import REFER
        from ..data.refcoco import ReferDataset
        from ..text.tokenizer import WordPieceTokenizer, resolve_vocab

        refer = REFER(args.refer_data_root, args.dataset, args.splitBy)
        tok = WordPieceTokenizer.from_vocab_file(
            resolve_vocab(args.vocab, args.bert_tokenizer))
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
                                          max_tokens=22,
                                          host_normalize=False))
            train_ds = ConcatDataset(parts)
        else:
            from ..data.transforms import build_paired_augment

            affine = None
            if args.aug_random_affine:
                a = args.aug_random_affine
                affine = {"degrees": (-a[0], a[0])}
                if len(a) >= 3:
                    affine["translate"] = (a[1], a[2])
                if len(a) >= 5:
                    affine["scale"] = (a[3], a[4])
            aug = build_paired_augment(
                resize_range=(tuple(args.aug_random_resize * 2)[:2]
                              if args.aug_random_resize else None),
                hflip=args.aug_random_hflip,
                crop=args.aug_random_crop, affine=affine, seed=args.seed)
            train_ds = ReferDataset(refer, tok, split=args.split,
                                    img_size=args.img_size,
                                    max_tokens=args.max_tokens,
                                    host_normalize=False, augment=aug)
        val_ds = ReferDataset(refer, tok, split=args.val_split,
                              img_size=args.img_size,
                              max_tokens=args.max_tokens, eval_mode=True,
                              host_normalize=False)

        # threaded decode/resize overlapped with the TPU step (the
        # reference's DataLoader-workers equivalent, train.py:554-563)
        from ..data.loader import PrefetchLoader, collate_refer

        loader = PrefetchLoader(train_ds, args.batch_size, collate_refer,
                                shuffle=True, num_workers=args.workers,
                                seed=args.seed,
                                shard_index=jax.process_index(),
                                num_shards=jax.process_count())
        iters_per_epoch = len(loader)

        def epoch_batches(epoch):
            loader.set_epoch(epoch)
            return iter(loader)

    tcfg = train_config_from_args(args, max(iters_per_epoch, 1))

    # init (one collated example; don't spin up the prefetch loader for it)
    if args.synthetic:
        b0 = {k: v[:1] for k, v in next(iter(epoch_batches(0))).items()}
    else:
        from ..data.loader import collate_refer, collate_video

        col = collate_video if video else collate_refer
        b0 = col([train_ds[0]])
        b0 = {k: v[:1] for k, v in b0.items()}
    vis0 = np.asarray(b0["video"] if video else b0["image"])
    if vis0.dtype == np.uint8:
        # the uint8 pipeline normalizes on device inside the step; for the
        # one-off init, normalize on host so init sees the real input dist
        from ..data.transforms import normalize as _host_norm

        vis0 = _host_norm(vis0)
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

    eval_apply = None
    if not args.synthetic:
        from ..models.factory import build_model as _bm

        eval_model = _bm(cfg, train=False)
        # ONE apply object for every epoch so the eval loops' jit cache
        # hits (a fresh lambda per epoch would recompile every time)
        eval_apply = lambda v, *a: eval_model.apply(v, *a)  # noqa: E731

    # A2D / combined-3D-pretrain save only on improvement (reference
    # train.py:775-811); RefCOCO and YTVOS save every epoch.
    best_metric = -1.0
    best_only = (args.dataset == "a2d" or args.image_combined_3d_pretrain
                 or args.dataset == "ref_pseudo_video") and not args.synthetic
    keep = args.keep_checkpoints
    if not keep and args.dataset == "ytvos" and \
            not args.pretrained_video_lavt_weights_on_refcocos:
        keep = 8  # reference keeps the last 8 for scratch YTVOS runs

    from ..utils.logging import MetricLogger, SmoothedValue

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        iou_sum, iou_n = 0.0, 0
        # MetricLogger: iter/data timing, ETA, per-chip HBM (the reference
        # MetricLogger.log_every line, utils.py:113-150)
        logger = MetricLogger(out=sys.stderr)
        logger.add_meter("lr", SmoothedValue(1, fmt="{value:.2e}"))
        batches = logger.log_every(
            _SizedIter(epoch_batches(epoch), iters_per_epoch),
            max(args.print_freq, 1), header=f"Epoch: [{epoch}]")
        for batch in batches:
            batch.pop("ref_id", None)
            batch = shard_batch(mesh, batch)
            state, metrics = step_fn(state, batch, key)
            # float() syncs on the step result — also what makes iter_time
            # real on an async dispatch backend
            logger.update(loss=float(metrics["loss"]),
                          iou=float(metrics["iou"]),
                          lr=float(metrics["lr"]))
            iou_sum += float(metrics["iou"])
            iou_n += 1
        logger.synchronize_between_processes()
        train_miou = 100.0 * iou_sum / max(iou_n, 1)
        print(f"epoch {epoch} done in {time.time() - t0:.1f}s "
              f"(train mIoU {train_miou:.2f})  {logger}", file=sys.stderr)

        # validation every epoch, like the reference (train.py:743, 768);
        # checkpoints are named with their metrics (train.py:761-762).
        tag = ""
        do_eval = (not args.synthetic
                   and (epoch + 1) % max(args.eval_every, 1) == 0)
        eval_vars = None
        if do_eval:
            eval_vars = {"params": jax.device_get(state.params),
                         "batch_stats": jax.device_get(state.batch_stats)}
        if do_eval and not video:
            from ..eval.refcoco_eval import evaluate

            summary = evaluate(eval_apply, eval_vars, val_ds, log_every=0,
                               image_dtype=(jnp.bfloat16
                                            if cfg.dtype == "bfloat16"
                                            else None),
                               cast_bf16=cfg.dtype == "bfloat16")
            tag = (f"mIoU_{summary['mIoU']:.2f}"
                   f"_oIoU_{summary['oIoU']:.2f}")
        elif do_eval and video and val_ds is not None:
            from ..eval.video_eval import evaluate_a2d

            summary = evaluate_a2d(eval_apply, eval_vars, val_ds)
            tag = (f"tmIoU_{train_miou:.2f}_mIoU_{summary['mIoU']:.2f}"
                   f"_oIoU_{summary['oIoU']:.2f}")
        elif video:
            tag = f"tmIoU_{train_miou:.2f}"

        if args.output_dir:
            if best_only and train_miou <= best_metric:
                print(f"epoch {epoch}: train mIoU {train_miou:.2f} did not "
                      f"improve on {best_metric:.2f}; not saving",
                      file=sys.stderr)
            else:
                best_metric = max(best_metric, train_miou)
                # --model_id goes into the checkpoint name like the
                # reference's model_best_{model_id}.pth (train.py:761-807)
                if args.model_id:
                    tag = f"{args.model_id}_{tag}" if tag else args.model_id
                save_checkpoint(args.output_dir, epoch, state,
                                extra={"args": vars(args)}, metrics_tag=tag,
                                keep=keep or None)
    print("training complete", file=sys.stderr)


if __name__ == "__main__":
    main()
