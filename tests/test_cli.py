"""Drop-in CLI parity: the reference README's three published commands
(train / finetune / validation, README.md:80-139) must parse verbatim
through our parser (minus the interpreter/device prefix) into the
published hyperparameters.  This is the literal "a reference user can
switch" test for the flag surface (config.py reference aliases)."""

import shlex

from dasa_tpu.config import parse_args

# README.md:82-96 — "### train" (train the model without updating
# vilbert), exactly as published minus `CUDA_VISIBLE_DEVICES=2 python
# r2r_src/train.py`.
TRAIN_CMD = """
--agent_type dg --adaIn_type channel --attn soft --train auglistener
--mlWeight_org 0.4
--mlWeight_aug 1.2
--ab_type a --a_type sigmoid
--d_vl_layers 3
--env_drop_stage after_adain
--depth_drop
--use_shift --shift_kernel_size 5
--warm_steps 1000 --decay_intervals 2000 --decay_start 4000 --lr_decay 0.2
--log_every 100 --val_every 2000 --use_lr_scheduler
--selfTrain --aug tasks/R2R/data/aug_paths.json
--speaker snap/speaker/state_dict/best_val_unseen_bleu
--pretrain_model_name ./pretrained_hug_models/dicadd/checkpoint-12864
--angleFeatSize 128 --accumulateGrad --featdropout 0.4 --feedback sample
--subout max --optim rms --lr 0.0001
--iters 20000 --maxAction 35 --encoderType Dic --batchSize 20
--include_vision True --use_dropout_vision True
--d_enc_hidden_size 1024 --critic_dim 1024
--name shift5_dga_sigmoid_vl3_ml2
"""

# README.md:99-120 — "### finetune" (the d_update_add_layer run).
FINETUNE_CMD = """
--agent_type dg --adaIn_type channel --attn soft --train auglistener
--load snap/shift5_dga_sigmoid_vl3_ml2/state_dict/LAST_iter20000
--d_update_add_layer True
--mlWeight_org 0.4 --mlWeight_aug 1.2
--ab_type a --a_type sigmoid --d_vl_layers 3
--env_drop_stage after_adain --depth_drop
--log_every 100 --val_every 1000
--use_shift --shift_kernel_size 5
--selfTrain --aug tasks/R2R/data/aug_paths.json
--speaker snap/speaker/state_dict/best_val_unseen_bleu
--pretrain_model_name ./pretrained_hug_models/dicadd/checkpoint-12864
--angleFeatSize 128 --accumulateGrad --featdropout 0.4 --feedback sample
--subout max --optim rms --lr 0.000002
--iters 30000 --maxAction 35 --encoderType Dic --batchSize 2
--include_vision True --use_dropout_vision True
--d_enc_hidden_size 1024 --critic_dim 1024
--name shift5_dga_sigmoid_vl3_ml2_fine
"""

# README.md:124-139 — "### validation" (--train validlistener --submit).
VALID_CMD = """
--agent_type dg --adaIn_type channel --attn soft --train validlistener
--submit
--load snap/shift5_dga_sigmoid_vl3_ml2_fine/state_dict/best_val_unseen
--d_update_add_layer True
--mlWeight_org 0.4 --mlWeight_aug 1.2
--ab_type a --a_type sigmoid --d_vl_layers 3
--env_drop_stage after_adain --depth_drop
--log_every 100 --val_every 1000
--use_shift --shift_kernel_size 5
--selfTrain --aug tasks/R2R/data/aug_paths.json
--speaker snap/speaker/state_dict/best_val_unseen_bleu
--pretrain_model_name ./pretrained_hug_models/dicadd/checkpoint-12864
--angleFeatSize 128 --accumulateGrad --featdropout 0.4 --feedback sample
--subout max --optim rms --lr 0.000002
--iters 30000 --maxAction 35 --encoderType Dic --batchSize 2
--include_vision True --use_dropout_vision True
--d_enc_hidden_size 1024 --critic_dim 1024
--name shift5_dga_sigmoid_vl3_ml2_fine
"""


def test_readme_train_command_parses():
    cfg = parse_args(shlex.split(TRAIN_CMD))
    assert cfg.train == "auglistener"
    assert cfg.agent_type == "dg"
    assert cfg.adain_type == "channel"
    assert cfg.ab_type == "a" and cfg.a_type == "sigmoid"
    assert cfg.d_vl_layers == 3
    assert cfg.env_drop_stage == "after_adain"
    assert cfg.depth_drop is True
    assert cfg.use_shift is True and cfg.shift_kernel_size == 5
    assert (cfg.warm_steps, cfg.decay_intervals, cfg.decay_start,
            cfg.lr_decay) == (1000, 2000, 4000, 0.2)
    assert cfg.use_lr_scheduler is True
    assert cfg.self_train is True
    assert cfg.aug == "tasks/R2R/data/aug_paths.json"
    assert cfg.speaker == "snap/speaker/state_dict/best_val_unseen_bleu"
    assert cfg.pretrain_model_name \
        == "./pretrained_hug_models/dicadd/checkpoint-12864"
    assert cfg.angle_feat_size == 128
    assert cfg.accumulate_grad is True
    assert cfg.featdropout == 0.4
    assert cfg.feedback == "sample" and cfg.sub_out == "max"
    assert cfg.optim == "rms" and cfg.lr == 1e-4
    assert cfg.iters == 20000 and cfg.max_action == 35
    assert cfg.encoder_type == "Dic" and cfg.batch_size == 20
    assert cfg.include_vision is True and cfg.use_dropout_vision is True
    assert cfg.d_enc_hidden_size == 1024 and cfg.critic_dim == 1024
    assert cfg.ml_weight_org == 0.4 and cfg.ml_weight_aug == 1.2
    assert cfg.d_update_add_layer is False  # train phase: vilbert frozen


def test_readme_finetune_command_parses():
    cfg = parse_args(shlex.split(FINETUNE_CMD))
    assert cfg.d_update_add_layer is True  # the finetune delta
    assert cfg.load \
        == "snap/shift5_dga_sigmoid_vl3_ml2/state_dict/LAST_iter20000"
    assert cfg.lr == 2e-6 and cfg.batch_size == 2 and cfg.iters == 30000
    assert cfg.name == "shift5_dga_sigmoid_vl3_ml2_fine"


def test_readme_validation_command_parses():
    cfg = parse_args(shlex.split(VALID_CMD))
    assert cfg.train == "validlistener" and cfg.submit is True
    assert cfg.load == ("snap/shift5_dga_sigmoid_vl3_ml2_fine/"
                        "state_dict/best_val_unseen")
    assert cfg.d_update_add_layer is True


def test_bool_flag_spellings():
    # bare, explicit-True, explicit-False, negated — all four forms
    assert parse_args(["--depth_drop"]).depth_drop is True
    assert parse_args(["--depth_drop", "True"]).depth_drop is True
    assert parse_args(["--depth_drop", "False"]).depth_drop is False
    base = parse_args(["--depth_drop", "--no_depth_drop"])
    assert base.depth_drop is False
