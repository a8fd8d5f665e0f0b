"""Config-composition tests: every shipped config must compose and its
component tree must instantiate (reference tests/test_configs.py intent)."""

from pathlib import Path

import pytest

from audiodiffuser_tpu.config import compose, expand_multirun, instantiate

CONFIG_DIR = str(Path(__file__).parent.parent / "configs")

EXPERIMENTS = sorted(
    str(p.relative_to(Path(CONFIG_DIR) / "experiment")).replace(".yaml", "")
    for p in (Path(CONFIG_DIR) / "experiment").rglob("*.yaml")
)


def test_train_config_composes():
    cfg = compose(CONFIG_DIR, "train", [])
    assert cfg.task_name == "train"
    assert cfg.model._target_.endswith("DiffusionSpecTask")
    assert cfg.data._target_.endswith("SC09DataModule")


def test_eval_config_composes():
    cfg = compose(CONFIG_DIR, "eval", [])
    assert cfg.task_name == "eval"


@pytest.mark.parametrize("exp", EXPERIMENTS)
def test_every_experiment_composes_and_instantiates(exp):
    """Unlike the reference (whose shipped configs reference missing targets,
    SURVEY §2.12), every experiment here must fully instantiate."""
    overrides = [f"experiment={exp}"]
    if "latent" in exp:
        # shrink the codec: the latent task initializes it to build params
        overrides += [
            "model.codec.encoder_dim=4",
            "model.codec.decoder_dim=16",
            "model.codec.latent_dim=8",
            "model.codec.n_codebooks=2",
            "model.codec.codebook_size=8",
            "model.codec.codebook_dim=4",
            "model.net.in_channels=8",
        ]
    cfg = compose(CONFIG_DIR, "train", overrides)
    model_cfg = dict(cfg.model)
    model_cfg.pop("optimizer")
    model_cfg.pop("scheduler", None)
    if "latent" in exp:
        # codec params normally come from codec_ckpt_path (orbax export)
        import jax
        import jax.numpy as jnp

        codec = instantiate(dict(model_cfg["codec"]))
        model_cfg["codec_params"] = codec.init(
            jax.random.key(0), jnp.zeros((1, 256, 1))
        )["params"]
    task = instantiate(model_cfg)
    assert hasattr(task, "loss_fn") and hasattr(task, "make_sample_fn")
    if hasattr(task, "sigmas"):  # diffusion tasks: scheduler materialized
        assert task.sigmas.shape[0] > 0


def test_cli_overrides_and_interpolation():
    cfg = compose(
        CONFIG_DIR,
        "train",
        [
            "experiment=sc09/diffunet_complex_sc09",
            "model.sampler.num_steps=7",
            "data.batch_size=3",
            "+model.sampler.eta=0.5",
            "seed=7",
        ],
    )
    assert cfg.model.sampler.num_steps == 7
    assert cfg.data.batch_size == 3
    assert cfg.model.sampler.eta == 0.5
    # interpolation: generated_frame_length <- ${audio_len}
    assert cfg.model.generated_frame_length == cfg.audio_len


def test_override_unknown_key_rejected():
    with pytest.raises(KeyError):
        compose(CONFIG_DIR, "train", ["model.not_a_key=1"])


def test_multirun_expansion():
    jobs = expand_multirun(["a=1,2", "b=x", "c=[1,2]"])
    assert len(jobs) == 2
    assert jobs[0] == ["a=1", "b=x", "c=[1,2]"]
    assert jobs[1] == ["a=2", "b=x", "c=[1,2]"]


def test_group_replacement_via_cli():
    cfg = compose(CONFIG_DIR, "train", ["trainer=cpu"])
    assert cfg.trainer.limit_train_batches == 2


def test_optimizer_instantiates():
    import optax

    cfg = compose(CONFIG_DIR, "train", [])
    opt = instantiate(cfg.model.optimizer)
    assert isinstance(opt, optax.GradientTransformation)


def test_lr_scheduler_config_builds():
    """model.scheduler as an optax schedule replaces the scalar LR."""
    import optax

    from train import build_trainer_and_task

    cfg = compose(
        CONFIG_DIR,
        "train",
        [
            "experiment=example",
            "+model.scheduler._target_=optax.cosine_decay_schedule",
            "+model.scheduler.init_value=1e-4",
            "+model.scheduler.decay_steps=1000",
            "paths.output_dir=/tmp/sched_cfg_test",
        ],
    )
    trainer, task, logger = build_trainer_and_task(cfg, "/tmp/sched_cfg_test")
    assert isinstance(trainer.optimizer, optax.GradientTransformation)
