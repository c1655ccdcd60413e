"""Tiny full-stack engine config: the exact structure of
gcd-model/configs/train_kubric_max90.yaml with every size shrunk. Used by unit
tests and by `__graft_entry__.dryrun_multichip` (multi-chip compile validation
on a virtual device mesh)."""

TINY_DD = dict(
    attn_type="vanilla",
    double_z=True,
    z_channels=4,
    resolution=32,
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 1, 1, 1],  # f8, tiny
    num_res_blocks=1,
    attn_resolutions=[],
    dropout=0.0,
)

CTX_DIM = 24
ADM = 24  # 3 embedders x outdim 8
AUX = 8


def tiny_engine_config():
    return {
        "target": "sgm.models.diffusion.DiffusionEngine",
        "params": {
            "scale_factor": 0.18215,
            "disable_first_stage_autocast": True,
            "use_ema": False,
            "en_and_decode_n_samples_a_time": 2,
            "ft_strategy": "everything",
            "denoiser_config": {
                "target": "sgm.modules.diffusionmodules.denoiser.Denoiser",
                "params": {
                    "scaling_config": {
                        "target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"
                    }
                },
            },
            "network_config": {
                "target": "sgm.modules.diffusionmodules.video_model.VideoUNet",
                "params": {
                    "adm_in_channels": ADM,
                    "num_classes": "sequential",
                    "use_checkpoint": False,
                    "in_channels": 8,
                    "out_channels": 4,
                    "model_channels": 32,
                    "attention_resolutions": [2, 1],
                    "num_res_blocks": 1,
                    "channel_mult": [1, 2],
                    "num_head_channels": 16,
                    "use_linear_in_transformer": True,
                    "transformer_depth": 1,
                    "context_dim": CTX_DIM,
                    "extra_ff_mix_layer": True,
                    "use_spatial_context": True,
                    "merge_strategy": "learned_with_images",
                    "video_kernel_size": [3, 1, 1],
                    "aux_emb_dim": AUX,
                },
            },
            "conditioner_config": {
                "target": "sgm.modules.GeneralConditioner",
                "params": {
                    "emb_models": [
                        {
                            "input_key": "cond_frames_without_noise",
                            "is_trainable": False,
                            "ucg_rate": 0.1,
                            "target": "sgm.modules.encoders.modules.FrozenOpenCLIPImagePredictionEmbedder",
                            "params": {
                                "n_cond_frames": 1,
                                "n_copies": 1,
                                "open_clip_embedding_config": {
                                    "target": "sgm.modules.encoders.modules.FrozenOpenCLIPImageEmbedder",
                                    "params": {
                                        "freeze": True,
                                        "clip_width": 32,
                                        "clip_layers": 2,
                                        "clip_heads": 2,
                                        "clip_patch_size": 8,
                                        "clip_image_size": 32,
                                        "clip_output_dim": CTX_DIM,
                                    },
                                },
                            },
                        },
                        {
                            "input_key": "fps_id",
                            "is_trainable": False,
                            "target": "sgm.modules.encoders.modules.ConcatTimestepEmbedderND",
                            "params": {"outdim": 8},
                        },
                        {
                            "input_key": "motion_bucket_id",
                            "is_trainable": True,
                            "target": "sgm.modules.encoders.modules.ConcatTimestepEmbedderND",
                            "params": {"outdim": 8},
                        },
                        {
                            "input_key": "cond_frames",
                            "is_trainable": False,
                            "ucg_rate": 0.1,
                            "target": "sgm.modules.encoders.modules.VideoPredictionEmbedderWithEncoder",
                            "params": {
                                "disable_encoder_autocast": True,
                                "n_cond_frames": 1,
                                "n_copies": 1,
                                "is_ae": True,
                                "encoder_config": {
                                    "target": "sgm.models.autoencoder.AutoencoderKLModeOnly",
                                    "params": {
                                        "embed_dim": 4,
                                        "monitor": "val/rec_loss",
                                        "ddconfig": TINY_DD,
                                        "lossconfig": {"target": "torch.nn.Identity"},
                                    },
                                },
                            },
                        },
                        {
                            "input_key": "cond_aug",
                            "is_trainable": False,
                            "target": "sgm.modules.encoders.modules.ConcatTimestepEmbedderND",
                            "params": {"outdim": 8},
                        },
                        {
                            "input_key": "scaled_relative_angles",
                            "is_trainable": True,
                            "target": "sgm.modules.encoders.modules.SphericalEmbedder",
                            "params": {"embed_dim": AUX, "zero_init": False},
                        },
                    ]
                },
            },
            "sampler_config": {
                "target": "sgm.modules.diffusionmodules.sampling.EulerEDMSampler",
                "params": {
                    "num_steps": 4,
                    "discretization_config": {
                        "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
                        "params": {"sigma_max": 700.0},
                    },
                    "guider_config": {
                        "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
                        "params": {"num_frames": 3, "max_scale": 2.5, "min_scale": 1.0},
                    },
                },
            },
            "loss_fn_config": {
                "target": "sgm.modules.diffusionmodules.loss.StandardDiffusionLoss",
                "params": {
                    "harmonize_sigmas": True,
                    "focus_top": 0.1,
                    "focus_steps": 100,
                    "batch2model_keys": ["image_only_indicator", "num_video_frames"],
                    "loss_weighting_config": {
                        "target": "sgm.modules.diffusionmodules.loss_weighting.EDMWeighting",
                        "params": {"sigma_data": 1.0},
                    },
                    "sigma_sampler_config": {
                        "target": "sgm.modules.diffusionmodules.sigma_sampling.EDMSampling",
                        "params": {"p_mean": 1.0, "p_std": 1.6},
                    },
                },
            },
            "first_stage_config": {
                "target": "sgm.models.autoencoder.AutoencodingEngine",
                "params": {
                    "loss_config": {"target": "torch.nn.Identity"},
                    "regularizer_config": {
                        "target": "sgm.modules.autoencoding.regularizers.DiagonalGaussianRegularizer"
                    },
                    "encoder_config": {
                        "target": "sgm.modules.diffusionmodules.model.Encoder",
                        "params": TINY_DD,
                    },
                    "decoder_config": {
                        "target": "sgm.modules.autoencoding.temporal_ae.VideoDecoder",
                        "params": {**TINY_DD, "video_kernel_size": [3, 1, 1]},
                    },
                },
            },
        },
    }
