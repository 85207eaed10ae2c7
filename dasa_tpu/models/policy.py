"""Assembled navigation policy.

One Flax module owning encoder / decoder / critic / AdaIN, mirroring the
reference agent's model wiring (r2r_src/agent_dg.py:102-260) but exposed
as pure per-step methods so the agent can jit them individually and run
the training replay as a single `lax.scan` program.

Step dataflow (vl path, agent_dg.py:725-936):
  gather pano + candidates -> env-drop (before/after AdaIN) -> AdaIN
  channel modulation -> cross-modal encoder (with per-episode cached text
  stack) -> decoder step -> candidate logits.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dasa_tpu.config import Config
from dasa_tpu.models.adain import adaptive_instance_normalization, make_adain
from dasa_tpu.models.bert import BertConfig
from dasa_tpu.models.decoder import AttnDecoderLSTM, BAttnDecoderLSTM, Critic
from dasa_tpu.models.encoder import (
    BertTextEncoderLSTM,
    DicEncoder,
    EncoderLSTM,
)

# encoders with no per-step vision input: the whole encoder runs once
# per episode and the decoder is the plain AttnDecoderLSTM
PLAIN_ENCODERS = ("EncoderLSTM", "BEncoder", "CEncoder", "Transformer",
                  "Gpt")
# legacy single-stream encoders whose ctx spans the joint
# [36 vision; L text] token sequence (models/legacy.py); BertMix runs
# the same fusion but strips the image rows, so its ctx is text-only
JOINT_CTX_ENCODERS = ("BertImg", "BertAdd")
LEGACY_CROSS_ENCODERS = ("BertImg", "BertAdd", "BertMix")


class StepInputs(NamedTuple):
    """Per-step featurized inputs (already gathered on device)."""

    action_feat: jnp.ndarray   # (B, A) angle feature of current pose
    f_t: jnp.ndarray           # (B, 36, F) rgb pano + angle
    d_t: jnp.ndarray           # (B, 36, F) depth pano + angle
    cand_feat: jnp.ndarray     # (B, K, F)
    cand_dfeat: jnp.ndarray    # (B, K, F)
    cand_mask: jnp.ndarray     # (B, K) True = masked (pad beyond STOP)
    cand_idx: Optional[jnp.ndarray] = None  # (B, K) view-token index per
                               # candidate (STOP slot = views); MT decoder


class DecoderState(NamedTuple):
    h: jnp.ndarray
    c: jnp.ndarray
    h1: jnp.ndarray


def decoder_state_width(cfg: Config) -> int:
    """Width of the DecoderState arrays: the double agent carries two
    decoder streams packed side by side; mcatt runs at the MCAN hidden
    width (param.py:235)."""
    if cfg.agent_type == "mcatt":
        return cfg.mcan_hidden_size
    base = (cfg.rnn_dim if cfg.encoder_type in PLAIN_ENCODERS
            else cfg.d_hidden_size)
    return base * (2 if cfg.agent_type == "double" else 1)


def bert_config_from(cfg: Config) -> BertConfig:
    base = (BertConfig.large if cfg.d_bert_type == "large"
            else BertConfig.base)
    return base(
        img_feature_dim=cfg.feature_all_size,
        la_layers=cfg.d_la_layers,
        vl_layers=cfg.d_vl_layers,
        v_layers=cfg.d_v_layers,
        update_lang_bert=cfg.d_transformer_update,
        update_add_layer=cfg.d_update_add_layer,
        hidden_dropout_prob=cfg.d_hidden_dropout_prob,
        attention_probs_dropout_prob=cfg.d_attn_dropout_prob,
    )


class DasaPolicy(nn.Module):
    cfg: Config
    vocab_size: int = 0          # word-vocab size (EncoderLSTM path)
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        feature_all = cfg.feature_all_size
        # measured on v5e: XLA's fusion already runs these small
        # bandwidth-bound ops at full HBM speed, so the Pallas paths are
        # opt-in ("always") rather than auto-enabled
        use_pallas = cfg.use_pallas == "always"
        self._use_pallas = use_pallas
        if cfg.encoder_type == "EncoderLSTM":
            enc_hidden = cfg.rnn_dim // 2 if cfg.bidir else cfg.rnn_dim
            self.encoder = EncoderLSTM(
                self.vocab_size, cfg.wemb, enc_hidden, cfg.dropout,
                bidirectional=cfg.bidir, sub_out=cfg.sub_out,
                zero_init=cfg.zero_init, dtype=self.dtype)
            self.decoder = AttnDecoderLSTM(
                cfg.aemb, cfg.rnn_dim, cfg.dropout, cfg.featdropout,
                feature_all, cfg.angle_feat_size, ctx_dim=cfg.rnn_dim,
                dtype=self.dtype)
            dec_hidden = cfg.rnn_dim
        elif cfg.encoder_type in ("BEncoder", "CEncoder"):
            # B/CEncoderLSTM (model.py:88-247): text-BERT -> biLSTM,
            # plain decoder path; update_bert gates the BERT freeze
            import dataclasses as _dc

            enc_hidden = cfg.rnn_dim // 2 if cfg.bidir else cfg.rnn_dim
            bcfg = _dc.replace(bert_config_from(cfg),
                               update_lang_bert=cfg.update_bert)
            self.encoder = BertTextEncoderLSTM(
                bcfg, enc_hidden, cfg.dropout,
                project_dim=(cfg.wemb if cfg.encoder_type == "CEncoder"
                             else None),
                bidirectional=cfg.bidir, sub_out=cfg.sub_out,
                zero_init=cfg.zero_init,
                n_layer_concat=cfg.d_bert_n_layers, dtype=self.dtype)
            self.decoder = AttnDecoderLSTM(
                cfg.aemb, cfg.rnn_dim, cfg.dropout, cfg.featdropout,
                feature_all, cfg.angle_feat_size, ctx_dim=cfg.rnn_dim,
                dtype=self.dtype)
            dec_hidden = cfg.rnn_dim
        elif cfg.encoder_type in ("Transformer", "Gpt"):
            # legacy transformer/gpt text encoders (r2rmodel.py:352-456,
            # 559-634) on the plain decoder path
            from dasa_tpu.models.legacy import TransformerTextEncoder

            self.encoder = TransformerTextEncoder(
                vocab_size=self.vocab_size, width=cfg.legacy_width,
                heads=cfg.legacy_heads, n_layers=cfg.legacy_layers,
                hidden_size=cfg.rnn_dim // 2 if cfg.bidir else cfg.rnn_dim,
                dec_hidden_size=cfg.rnn_dim, dropout_ratio=cfg.dropout,
                bidirectional=cfg.bidir,
                causal=cfg.encoder_type == "Gpt", dtype=self.dtype)
            self.decoder = AttnDecoderLSTM(
                cfg.aemb, cfg.rnn_dim, cfg.dropout, cfg.featdropout,
                feature_all, cfg.angle_feat_size, ctx_dim=cfg.rnn_dim,
                dtype=self.dtype)
            dec_hidden = cfg.rnn_dim
        elif cfg.agent_type == "mcatt":
            # agent_mcatt: MCAN co-attention encoder + plain decoder at
            # the MCAN hidden width (agent_mcatt.py:125-131,
            # param.py:233-244)
            from dasa_tpu.models.mcan import McattEncoder
            from dasa_tpu.models.variants import McattDecoder

            mh = cfg.mcan_hidden_size
            self.encoder = McattEncoder(
                vocab_size=self.vocab_size, word_embed_size=cfg.wemb,
                hidden_size=mh, n_head=cfg.mcan_heads, ff_size=4 * mh,
                n_layers=cfg.mcan_layers, img_feat_size=feature_all,
                flat_mlp_size=cfg.mcan_flat_mlp_size, flat_out_size=mh,
                dtype=self.dtype)
            self.decoder = McattDecoder(
                cfg.aemb, mh, cfg.dropout, cfg.featdropout, feature_all,
                cfg.angle_feat_size, ctx_dim=mh,
                max_input=cfg.max_input, dtype=self.dtype)
            dec_hidden = mh
        else:  # cross-modal path (Dic + legacy single-stream encoders)
            if cfg.encoder_type in LEGACY_CROSS_ENCODERS:
                from dasa_tpu.models.legacy import (
                    BertAddEncoder,
                    BertImgEncoder,
                )

                if cfg.encoder_type == "BertImg":
                    self.encoder = BertImgEncoder(
                        bert_config_from(cfg), cfg.d_enc_hidden_size,
                        cfg.d_hidden_size, cfg.d_dropout_ratio,
                        bidirectional=cfg.d_bidirectional,
                        n_vision_tokens=cfg.views, dtype=self.dtype)
                else:
                    self.encoder = BertAddEncoder(
                        bert_config_from(cfg), cfg.d_enc_hidden_size,
                        cfg.d_hidden_size, cfg.d_dropout_ratio,
                        bidirectional=cfg.d_bidirectional,
                        n_vision_tokens=cfg.views,
                        strip_vision_ctx=cfg.encoder_type == "BertMix",
                        dtype=self.dtype)
            else:
                self.encoder = DicEncoder(
                    bert_config_from(cfg), cfg.d_enc_hidden_size,
                    cfg.d_hidden_size, cfg.d_dropout_ratio,
                    bidirectional=cfg.d_bidirectional,
                    reverse_input=cfg.d_reverse_input,
                    top_lstm=cfg.d_top_lstm,
                    ctx_v=cfg.ctx_v, ctx_v_dim=feature_all,
                    dtype=self.dtype)
            num_dir = 2 if cfg.d_bidirectional else 1
            ctx_dim = (cfg.d_enc_hidden_size * num_dir if cfg.d_top_lstm
                       else (1024 if cfg.d_bert_type == "large" else 768))
            kw = dict(embedding_size=cfg.aemb,
                      hidden_size=cfg.d_hidden_size,
                      dropout_ratio=cfg.dropout,
                      featdropout=cfg.featdropout,
                      feature_size=feature_all,
                      angle_feat_size=cfg.angle_feat_size,
                      ctx_dim=ctx_dim, dtype=self.dtype)
            agent = cfg.agent_type
            if agent == "double":
                # dual RGB+depth decoders with summed candidate logits
                # (reference agent_double, model.py:934-968)
                from dasa_tpu.models.variants import (
                    DoubleBAttnDecoderLSTM,
                )

                self.decoder = DoubleBAttnDecoderLSTM(**kw)
            elif agent in ("advanced", "kvmem", "new", "mutan", "mt"):
                from dasa_tpu.models import variants

                cls = {"advanced": variants.AdvancedDecoderLSTM,
                       "kvmem": variants.KVMemAttnDecoderLSTM,
                       "new": variants.NewAttnDecoderLSTM,
                       "mutan": variants.MutanAttnDecoderLSTM,
                       "mt": variants.MTDecoder}[agent]
                extra = {}
                if agent == "advanced":
                    extra["max_input"] = cfg.max_input
                    extra["pred_back"] = cfg.pred_back
                elif agent in ("kvmem", "new"):
                    extra["pred_back"] = cfg.pred_back
                elif agent == "mt":
                    extra["vemb_dim"] = (1024 if cfg.d_bert_type == "large"
                                         else 768)
                self.decoder = cls(**kw, **extra)
            else:  # default / dg (+ decoder_type dyrelu)
                self.decoder = BAttnDecoderLSTM(
                    **kw, use_shift=cfg.use_shift,
                    shift_kernel_size=cfg.shift_kernel_size,
                    pred_back=cfg.pred_back, back_input=cfg.back_input,
                    use_dyrelu=cfg.decoder_type == "dyrelu",
                    pred_pm=cfg.pred_pm, pm_type=cfg.pm_type,
                    max_input=cfg.max_input, use_pallas=use_pallas)
            dec_hidden = cfg.d_hidden_size
        self.critic = Critic(cfg.critic_dim, cfg.dropout, self.dtype)
        self.adain = make_adain(cfg.adain_type, cfg.feature_size,
                                cfg.ab_type, cfg.a_type, self.dtype,
                                use_pallas=use_pallas)
        self._dec_hidden = dec_hidden

    # ---- episode-level ----
    def encode_text(self, instr, valid_mask, seq_len, *,
                    deterministic: bool = True):
        """Per-episode cacheable computation.  Dic: the text-only BERT
        stack.  Mcatt: embed + biLSTM token stream.  EncoderLSTM: the
        whole encoder (no vision input)."""
        if self.cfg.encoder_type in PLAIN_ENCODERS:
            ctx, h0, c0 = self.encoder(instr, valid_mask,
                                       deterministic=deterministic)
            return {"ctx": ctx, "h0": h0, "c0": c0}
        if self.cfg.agent_type == "mcatt":
            return {"text_embeds": self.encoder.text_forward(
                instr, ~valid_mask, deterministic=deterministic)}
        return {"text_embeds": self.encoder.text_forward(
            instr, valid_mask, deterministic=deterministic)}

    # ---- per-step pieces ----
    def encode_step(self, cached: Dict[str, jnp.ndarray], valid_mask,
                    seq_len, f_t, *, deterministic: bool = True,
                    lstm_pallas: bool = False):
        """Per-step encoding.  Returns (ctx, h0, c0, ctx_v, v_emb)."""
        if self.cfg.encoder_type in PLAIN_ENCODERS:
            return cached["ctx"], cached["h0"], cached["c0"], None, None
        if self.cfg.agent_type == "mcatt":
            # decoder state starts from (attended_txt, attended_v)
            # (agent_mcatt.py:620-623)
            ctx, att_txt, _v, att_v = self.encoder.cross_forward(
                cached["text_embeds"], ~valid_mask, f_t,
                deterministic=deterministic)
            return ctx, att_txt, att_v, None, None
        kw = ({"lstm_pallas": lstm_pallas}
              if isinstance(self.encoder, DicEncoder) else {})
        ctx, h0, c0, ctx_v, visn = self.encoder(
            cached["text_embeds"], valid_mask, seq_len,
            f_t_all=f_t if self.cfg.include_vision else None,
            deterministic=deterministic, **kw)
        return ctx, h0, c0, ctx_v, visn

    def apply_adain(self, inputs: StepInputs, *, is_test: bool = True,
                    gumbel_rng=None) -> StepInputs:
        """Depth-guided modulation of the pano/candidate visual channels;
        dispatch mirrors vl_rollout (agent_dg.py:742-777)."""
        cfg = self.cfg
        a = cfg.angle_feat_size
        if cfg.adain_type == "none":
            if cfg.agent_type == "double":
                return inputs  # double keeps raw depth in the d_t slot
            # decoder consumes the rgb pano when AdaIN is off
            # (vl_rollout: df_t = f_t.clone(), agent_dg.py:729)
            return inputs._replace(d_t=inputs.f_t,
                                   cand_dfeat=inputs.cand_feat)
        f_vis, f_ang = inputs.f_t[..., :-a], inputs.f_t[..., -a:]
        d_vis = inputs.d_t[..., :-a]
        c_vis, c_ang = inputs.cand_feat[..., :-a], inputs.cand_feat[..., -a:]
        cd_vis = inputs.cand_dfeat[..., :-a]

        def mod(content, style):
            if cfg.adain_type == "default":
                return adaptive_instance_normalization(content, style)
            return self.adain(content, style, is_test=is_test,
                              gumbel_rng=gumbel_rng)

        if cfg.adain_type in ("rgb_stat_channel", "rgb_meanchannel"):
            df_vis, cand_vis = mod(f_vis, f_vis), mod(c_vis, f_vis)
        elif cfg.adain_type == "rgb_channel":
            df_vis, cand_vis = mod(f_vis, f_vis), mod(c_vis, c_vis)
        elif cfg.adain_type in ("depth_stat_channel",):
            df_vis, cand_vis = mod(f_vis, d_vis), mod(c_vis, d_vis)
        elif cfg.adain_type in ("channel", "coco_channel", "default"):
            df_vis, cand_vis = mod(f_vis, d_vis), mod(c_vis, cd_vis)
        elif cfg.adain_type == "meanchannel":
            df_vis, cand_vis = mod(f_vis, d_vis), mod(c_vis, f_vis)
        else:
            raise ValueError(cfg.adain_type)
        # "channel"-family writes the modulated pano into df_t (the
        # decoder's pano input) and keeps f_t for the encoder
        # (agent_dg.py:764-768); "default" overwrites f_t itself.
        df_t = jnp.concatenate([df_vis, f_ang], axis=-1)
        cand = jnp.concatenate([cand_vis, c_ang], axis=-1)
        if cfg.adain_type == "default":
            return inputs._replace(f_t=df_t, cand_feat=cand)
        # _replace keeps the passthrough fields (cand_mask, cand_idx —
        # the MT decoder's view-token gather) intact
        return inputs._replace(d_t=df_t, cand_feat=cand)

    def decode_step(self, inputs: StepInputs, state: DecoderState,
                    ctx, ctx_mask, *, deterministic: bool = True,
                    already_dropfeat: bool = False,
                    input_noise=None, output_noise=None, v_emb=None):
        """One decoder step over the (AdaIN'd) pano df_t (stored in the
        d_t slot by apply_adain) and candidates."""
        if self.cfg.agent_type == "mt":
            h, c, logit, h1, aux = self.decoder(
                inputs.action_feat, inputs.d_t, inputs.cand_feat,
                state.h1, state.c, ctx, ctx_mask,
                deterministic=deterministic,
                already_dropfeat=already_dropfeat, v_emb=v_emb,
                cand_idx=inputs.cand_idx)
            return DecoderState(h, c, h1), logit, aux
        if self.cfg.agent_type == "double":
            half = self.cfg.d_hidden_size
            (h, c, h1), (hd, cd, h1d), logit, aux = self.decoder(
                inputs.action_feat, inputs.f_t, inputs.d_t,
                inputs.cand_feat, inputs.cand_dfeat,
                state.h1[:, :half], state.c[:, :half],
                state.h1[:, half:], state.c[:, half:],
                ctx, ctx_mask, deterministic=deterministic,
                already_dropfeat=already_dropfeat)
            packed = DecoderState(
                h=jnp.concatenate([h, hd], axis=-1),
                c=jnp.concatenate([c, cd], axis=-1),
                h1=jnp.concatenate([h1, h1d], axis=-1))
            return packed, logit, aux
        h, c, logit, h1, aux = self.decoder(
            inputs.action_feat, inputs.d_t, inputs.cand_feat,
            state.h1, state.c, ctx, ctx_mask,
            deterministic=deterministic, already_dropfeat=already_dropfeat,
            input_noise=input_noise, output_noise=output_noise)
        return DecoderState(h, c, h1), logit, aux

    def value(self, h, *, deterministic: bool = True):
        return self.critic(h, deterministic=deterministic)

    def _apply_env_noise(self, inputs: StepInputs, env_noise) -> StepInputs:
        """Multiply the visual channels by the shared per-rollout noise
        vector (consistent env-drop, agent_dg.py:731-736, 780-785)."""
        a = self.cfg.angle_feat_size

        def noised(x):
            return jnp.concatenate(
                [x[..., :-a] * env_noise, x[..., -a:]], axis=-1)

        f_t = noised(inputs.f_t)
        cand = noised(inputs.cand_feat)
        if self.cfg.depth_drop:
            d_t = noised(inputs.d_t)
            cand_d = noised(inputs.cand_dfeat)
        else:
            d_t, cand_d = inputs.d_t, inputs.cand_dfeat
        return inputs._replace(f_t=f_t, d_t=d_t, cand_feat=cand,
                               cand_dfeat=cand_d)

    def percept_step(self, cached: Dict[str, jnp.ndarray], valid_mask,
                     seq_len, inputs: StepInputs, *,
                     deterministic: bool = True, is_test: bool = True,
                     env_noise=None, lstm_pallas: bool = False):
        """The decoder-state-INDEPENDENT part of one rollout step:
        env-drop -> AdaIN -> cross-modal encoder (vl_rollout,
        agent_dg.py:725-797).  Because nothing here depends on the
        decoder state, the training replay runs this batched over ALL
        episode steps at once (vmapped over T) and only the small
        decoder recurrence stays sequential.

        Returns (ctx, h0, c0, processed_inputs)."""
        cfg = self.cfg
        consistent = env_noise is not None
        if consistent and cfg.env_drop_stage == "before_adain":
            inputs = self._apply_env_noise(inputs, env_noise)
        gumbel_rng = (self.make_rng("dropout")
                      if (cfg.a_type == "gumbel_sigmoid" and not is_test)
                      else None)
        inputs = self.apply_adain(inputs, is_test=is_test,
                                  gumbel_rng=gumbel_rng)
        if consistent and cfg.env_drop_stage == "after_adain":
            inputs = self._apply_env_noise(inputs, env_noise)
        ctx, h0, c0, ctx_v, v_emb = self.encode_step(
            cached, valid_mask, seq_len, inputs.f_t,
            deterministic=deterministic, lstm_pallas=lstm_pallas)
        if ctx_v is not None:
            inputs = inputs._replace(d_t=inputs.d_t + ctx_v)
        if cfg.agent_type == "double":
            # both decoder streams start from the encoder state
            h0 = jnp.concatenate([h0, h0], axis=-1)
            c0 = jnp.concatenate([c0, c0], axis=-1)
        percept = {"ctx": ctx, "h0": h0, "c0": c0, "inputs": inputs}
        if cfg.encoder_type in JOINT_CTX_ENCODERS:
            # ctx spans [36 vision; L text] tokens — extend the mask
            batch = valid_mask.shape[0]
            percept["ctx_valid"] = jnp.concatenate(
                [jnp.ones((batch, cfg.views), bool), valid_mask], axis=1)
        if cfg.agent_type == "mt":
            percept["v_emb"] = v_emb
        return percept

    def decode_from_percept(self, percept: Dict, valid_mask,
                            state: DecoderState, is_first, *,
                            deterministic: bool = True,
                            already_dropfeat: bool = False,
                            input_noise=None, output_noise=None):
        """The decoder-state-DEPENDENT tail of one rollout step: state
        select at t=0, decoder LSTM step, candidate logits, critic
        (vl_rollout, agent_dg.py:798-830)."""
        h0, c0 = percept["h0"], percept["c0"]
        first = is_first.astype(h0.dtype)[:, None]
        state = DecoderState(
            h=first * h0 + (1 - first) * state.h,
            c=first * c0 + (1 - first) * state.c,
            h1=first * h0 + (1 - first) * state.h1,
        )
        ctx_valid = percept.get("ctx_valid", valid_mask)
        state, logit, aux = self.decode_step(
            percept["inputs"], state, percept["ctx"], ~ctx_valid,
            deterministic=deterministic,
            already_dropfeat=already_dropfeat, input_noise=input_noise,
            output_noise=output_noise, v_emb=percept.get("v_emb"))
        # mcatt's critic reads h_tilde (agent_mcatt.py:630 appends h1)
        critic_in = (state.h1 if self.cfg.agent_type == "mcatt"
                     else state.h)
        value = self.critic(critic_in, deterministic=deterministic)
        return state, logit, value, aux

    def policy_step(self, cached: Dict[str, jnp.ndarray], valid_mask,
                    seq_len, inputs: StepInputs, state: DecoderState,
                    is_first, *, deterministic: bool = True,
                    is_test: bool = True, env_noise=None,
                    input_noise=None, output_noise=None):
        """The complete per-step forward (vl_rollout body,
        agent_dg.py:725-830): percept_step + decode_from_percept under a
        single rng stream.  Used by eval paths (search, compile checks);
        the agent's act/replay programs call the two halves as separate
        applies with split rng streams so the replay can vmap percepts
        over time while staying bit-identical to acting."""
        percept = self.percept_step(
            cached, valid_mask, seq_len, inputs,
            deterministic=deterministic, is_test=is_test,
            env_noise=env_noise)
        return self.decode_from_percept(
            percept, valid_mask, state, is_first,
            deterministic=deterministic,
            already_dropfeat=env_noise is not None,
            input_noise=input_noise, output_noise=output_noise)

    # ---- init convenience ----
    def __call__(self, instr, valid_mask, seq_len, inputs: StepInputs):
        cached = self.encode_text(instr, valid_mask, seq_len)
        percept = self.percept_step(cached, valid_mask, seq_len, inputs)
        state = DecoderState(percept["h0"], percept["c0"], percept["h0"])
        batch = instr.shape[0]
        state, logit, value, aux = self.decode_from_percept(
            percept, valid_mask, state,
            jnp.ones((batch,), bool))
        return logit, value
