"""Multi-scale teacher/student knowledge-distillation models (the flagship).

Reference mapping:
- TeacherEncoder / UniTeacherEncoder  -> models/Modules.py:172-240 / 101-169
- StudentEncoder (+ ClusterMergeNet)  -> models/Modules.py:242-309,
                                         models/ClusterMergeNet.py:183-207
- TeacherNet / UniTeacherNet          -> models/Modules.py:355-395 / 312-352
- StudentNet                          -> models/Modules.py:428-457
- TeachersNet / UniTeachersNet / StudentsNet -> models/model.py:795-964 / 709-792
- TeacherStudentNet / MultiScaleNet   -> models/model.py:571-706

Every model returns the reference's structured dicts (feature/att/logits/
hazards/S/risk) so trainers and eval loops are drop-in compatible.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.cluster import cluster_merge
from .deform_attention import DeformCrossAttention2D
from .layers import FusionNet, Pooler, TransFusionLayer, combine_logits, survival_chain
from .maxnet import MaxNet


def _scale_vmap(module_cls, n_call_args: int):
    """Lift ``module_cls`` over a leading scale axis of size 2: params get a
    stacked leading dim (one slice per magnification), inputs broadcast except
    the first (the per-scale path bag).  With ``cfg.branch_devices`` the
    stacked axis is sharded over a 'scale' mesh axis so each device group
    computes one magnification's branch (parallel/branch_shard.py)."""
    return nn.vmap(
        module_cls,
        in_axes=(0,) + (None,) * (n_call_args - 1),
        out_axes=0,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
    )


def _deform2d(name: str, dim: int = 128) -> DeformCrossAttention2D:
    # instantiation constants from reference models/Modules.py:107-126
    return DeformCrossAttention2D(
        dim=dim, dim_head=64, heads=8, dropout=0.1, downsample_factor=4,
        offset_scale=4, offset_groups=8, offset_kernel_size=6, name=name,
    )


class ClusterMergeNet(nn.Module):
    """LayerNorm + exp(score) token weighting + DPC-KNN merge
    (reference models/ClusterMergeNet.py:183-207)."""

    sample_ratio: float
    dim_out: int
    min_clusters: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, N, C = x.shape
        x = nn.LayerNorm(name="norm")(x)
        token_score = nn.Dense(1, name="score")(x)
        token_weight = jnp.exp(token_score)
        cluster_num = max(max(math.ceil(N * self.sample_ratio), 1), self.min_clusters)
        if deterministic:
            # Fixed eval-time density tie-break: the reference draws this
            # 1e-6 jitter from the global torch RNG even in eval
            # (models/ClusterMergeNet.py:101), making its eval
            # order-dependent; a pinned key keeps eval deterministic while
            # remaining within the tie-break's 1e-6 magnitude.
            key = jax.random.PRNGKey(0)
        else:
            key = self.make_rng("dropout")
        return cluster_merge(x, cluster_num, token_weight, k=5, key=key)


class TeacherEncoder(nn.Module):
    """Genomics-guided encoder: two deformable cross attentions (omic queries
    into the WSI grid), residual, FusionNet, and two TransFusionLayers against
    the first fused token (reference models/Modules.py:172-240)."""

    dim: int = 128

    @nn.compact
    def __call__(self, x1: tuple, x2: jnp.ndarray, deterministic: bool = True):
        norm = nn.LayerNorm(name="norm")  # single shared LN, as in reference
        a1, attn1 = _deform2d("attn2d_omic1", self.dim)(
            norm(x1[0]), norm(x2), deterministic=deterministic)
        a2, attn2 = _deform2d("attn2d_omic2", self.dim)(
            norm(x1[1]), norm(x2), deterministic=deterministic)
        x_out1 = x1[0] + a1
        x_out2 = x1[1] + a2
        x = FusionNet(self.dim, name="fusion_layer")(x_out1, x_out2)  # [B,N,C]

        query = norm(x)
        kv1 = norm(x1[0][:, :1, :])
        kv2 = norm(x1[1][:, :1, :])
        f1, _ = TransFusionLayer(self.dim, name="transfusion_layer1")(
            query, kv1, deterministic=deterministic)
        f2, _ = TransFusionLayer(self.dim, name="transfusion_layer2")(
            query, kv2, deterministic=deterministic)
        return f1, f2, attn1, attn2  # [B,1,C] x2, [B,8,N,K] x2


class StudentEncoder(nn.Module):
    """Pathology-only encoder: deformable self attention + residual, then
    DPC-KNN cluster merge down to ``ceil(N * ratio)`` tokens
    (reference models/Modules.py:242-309)."""

    dim: int = 128
    sample_ratio: float = 0.0008

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, deterministic: bool = True):
        norm = nn.LayerNorm(name="norm")
        a, attn = _deform2d("attn2d", self.dim)(norm(x1), norm(x2),
                                                deterministic=deterministic)
        x = x1 + a
        merged = ClusterMergeNet(
            sample_ratio=self.sample_ratio, dim_out=self.dim, min_clusters=2,
            name="cluster_merge",
        )(x, deterministic=deterministic)
        return merged, attn  # [B,K,C], [B,8,N,144]


class TeacherNet(nn.Module):
    """Single-scale genomics-guided teacher (reference models/Modules.py:355-395)."""

    label_dim: int
    path_dim: int = 128
    unimodal: bool = False  # True = UniTeacherNet (queries are [path, path])

    @nn.compact
    def __call__(self, path: jnp.ndarray, omic_list=None, deterministic: bool = True):
        path = nn.relu(nn.Dense(self.path_dim, name="_fc1")(path))
        N = path.shape[1]
        if self.unimodal:
            queries = (path, path)
        else:
            omic1 = jnp.broadcast_to(omic_list[0][:, None, :], (path.shape[0], N, self.path_dim))
            omic2 = jnp.broadcast_to(omic_list[1][:, None, :], (path.shape[0], N, self.path_dim))
            queries = (omic1, omic2)

        f1, f2, att1, att2 = TeacherEncoder(self.path_dim, name="encoder")(
            queries, path, deterministic=deterministic)
        norm = nn.LayerNorm(name="norm")
        feature1 = Pooler(self.path_dim, name="pooler1")(norm(f1))  # [B,C]
        feature2 = Pooler(self.path_dim, name="pooler2")(norm(f2))
        concat = jnp.concatenate([feature1, feature2], axis=-1)
        logits = nn.Dense(self.label_dim, name="classifier")(concat)
        hazards, S, risk = survival_chain(logits)
        return logits, hazards, S, risk, feature1, feature2, att1, att2


class StudentNet(nn.Module):
    """Single-scale pathology-only student (reference models/Modules.py:428-457):
    the two cluster tokens are concatenated into the classifier input."""

    label_dim: int
    path_dim: int = 128
    sample_ratio: float = 0.0008

    @nn.compact
    def __call__(self, path: jnp.ndarray, deterministic: bool = True):
        path = nn.relu(nn.Dense(self.path_dim, name="_fc1")(path))
        feature, att = StudentEncoder(
            self.path_dim, self.sample_ratio, name="encoder"
        )(path, path, deterministic=deterministic)
        # concat first two cluster tokens (reference models/Modules.py:450;
        # with ratio 0.0008 * 2500 tokens -> exactly 2 clusters)
        feature = jnp.concatenate([feature[:, 0, :], feature[:, 1, :]], axis=-1)
        logits = nn.Dense(self.label_dim, name="classifier")(feature)
        hazards, S, risk = survival_chain(logits)
        return logits, hazards, S, risk, feature, att


class TeachersNet(nn.Module):
    """Two-scale teacher ensemble with per-compartment omic encoders
    (reference models/model.py:795-878)."""

    label_dim: int
    input_size_omic_tumor: int
    input_size_omic_immune: int
    path_dim: int = 128
    omic_dim: int = 128
    dropout_rate: float = 0.1
    combination_type: str = "max_confidence"
    unimodal: bool = False  # True = UniTeachersNet (reference :709-792)
    # stack the two TeacherNets along a leading scale axis (branch
    # parallelism, parallel/branch_shard.py); params move from
    # teacher10_net/teacher20_net to one teacher_nets subtree
    stacked_scales: bool = False

    @nn.compact
    def __call__(self, x_path10, x_path20, x_omic_tumor, x_omic_immune,
                 deterministic: bool = True):
        omic_t, _, _ = MaxNet(self.input_size_omic_tumor, self.omic_dim,
                              dropout_rate=self.dropout_rate, label_dim=self.label_dim,
                              name="omic_net_tumor")(x_omic_tumor, deterministic)
        omic_i, _, _ = MaxNet(self.input_size_omic_immune, self.omic_dim,
                              dropout_rate=self.dropout_rate, label_dim=self.label_dim,
                              name="omic_net_immune")(x_omic_immune, deterministic)
        if self.stacked_scales:
            teas = _scale_vmap(TeacherNet, 3)(
                self.label_dim, self.path_dim, unimodal=self.unimodal,
                name="teacher_nets")
            xs = jnp.stack([x_path10, x_path20])  # [2, B, N, 1024]
            l, h, s, r, f1, f2, a1, a2 = teas(xs, [omic_t, omic_i],
                                              deterministic)
            (l10, h10, s10, r10, f1_10, f2_10, a1_10, a2_10) = (
                l[0], h[0], s[0], r[0], f1[0], f2[0], a1[0], a2[0])
            (l20, h20, s20, r20, f1_20, f2_20, a1_20, a2_20) = (
                l[1], h[1], s[1], r[1], f1[1], f2[1], a1[1], a2[1])
        else:
            tea10 = TeacherNet(self.label_dim, self.path_dim,
                               unimodal=self.unimodal, name="teacher10_net")
            tea20 = TeacherNet(self.label_dim, self.path_dim,
                               unimodal=self.unimodal, name="teacher20_net")
            l10, h10, s10, r10, f1_10, f2_10, a1_10, a2_10 = tea10(
                x_path10, [omic_t, omic_i], deterministic)
            l20, h20, s20, r20, f1_20, f2_20, a1_20, a2_20 = tea20(
                x_path20, [omic_t, omic_i], deterministic)

        l_teas = combine_logits(l10, l20, self.combination_type)
        h_teas, s_teas, r_teas = survival_chain(l_teas)

        feature_dict = {"feature1_tea10": f1_10, "feature1_tea20": f1_20,
                        "feature2_tea10": f2_10, "feature2_tea20": f2_20}
        att_dict = {"att1_tea10": a1_10, "att1_tea20": a1_20,
                    "att2_tea10": a2_10, "att2_tea20": a2_20}
        logits_dict = {"logits_tea10": l10, "logits_tea20": l20, "logits_teas": l_teas}
        hazards_dict = {"hazards_tea10": h10, "hazards_tea20": h20, "hazards_teas": h_teas}
        S_dict = {"S_tea10": s10, "S_tea20": s20, "S_teas": s_teas}
        risk_dict = {"risk_tea10": r10, "risk_tea20": r20, "risk_teas": r_teas}
        return feature_dict, att_dict, logits_dict, hazards_dict, S_dict, risk_dict


class StudentsNet(nn.Module):
    """Two-scale student ensemble (reference models/model.py:880-964)."""

    label_dim: int
    path_dim: int = 128
    sample_ratio: float = 0.0008
    combination_type: str = "max_confidence"
    stacked_scales: bool = False  # see TeachersNet / parallel/branch_shard.py

    @nn.compact
    def __call__(self, x_path10, x_path20, deterministic: bool = True):
        if self.stacked_scales:
            stus = _scale_vmap(StudentNet, 2)(
                self.label_dim, self.path_dim, self.sample_ratio,
                name="student_nets")
            xs = jnp.stack([x_path10, x_path20])
            l, h, s, r, f, a = stus(xs, deterministic)
            l10, h10, s10, r10, f10, a10 = l[0], h[0], s[0], r[0], f[0], a[0]
            l20, h20, s20, r20, f20, a20 = l[1], h[1], s[1], r[1], f[1], a[1]
            a_stacked = a  # scale-leading maps for path_batch_loss_stacked
        else:
            stu10 = StudentNet(self.label_dim, self.path_dim, self.sample_ratio,
                               name="student10_net")
            stu20 = StudentNet(self.label_dim, self.path_dim, self.sample_ratio,
                               name="student20_net")
            l10, h10, s10, r10, f10, a10 = stu10(x_path10, deterministic)
            l20, h20, s20, r20, f20, a20 = stu20(x_path20, deterministic)
            a_stacked = None

        l_stus = combine_logits(l10, l20, self.combination_type)
        h_stus, s_stus, r_stus = survival_chain(l_stus)

        feature_dict = {"feature_stu10": f10, "feature_stu20": f20}
        att_dict = {"att_stu10": a10, "att_stu20": a20}
        if a_stacked is not None:
            # scale-leading view for the branch-partitioned consistency loss
            # (train/losses.py path_batch_loss_stacked); eval export skips it
            att_dict["att_stu_stacked"] = a_stacked
        logits_dict = {"logits_stu10": l10, "logits_stu20": l20, "logits_stus": l_stus}
        hazards_dict = {"hazards_stu10": h10, "hazards_stu20": h20, "hazards_stus": h_stus}
        S_dict = {"S_stu10": s10, "S_stu20": s20, "S_stus": s_stus}
        risk_dict = {"risk_stu10": r10, "risk_stu20": r20, "risk_stus": r_stus}
        return feature_dict, att_dict, logits_dict, hazards_dict, S_dict, risk_dict


class TeacherStudentNet(nn.Module):
    """Joint single-scale teacher+student pair (reference models/model.py:571-604)."""

    label_dim: int
    input_size_omic_tumor: int
    input_size_omic_immune: int
    path_dim: int = 128
    omic_dim: int = 128
    dropout_rate: float = 0.1
    sample_ratio: float = 0.0008

    @nn.compact
    def __call__(self, x_path, x_omic_tumor, x_omic_immune, deterministic: bool = True):
        omic_t, _, _ = MaxNet(self.input_size_omic_tumor, self.omic_dim,
                              dropout_rate=self.dropout_rate, label_dim=self.label_dim,
                              name="omic_net_tumor")(x_omic_tumor, deterministic)
        omic_i, _, _ = MaxNet(self.input_size_omic_immune, self.omic_dim,
                              dropout_rate=self.dropout_rate, label_dim=self.label_dim,
                              name="omic_net_immune")(x_omic_immune, deterministic)
        stu = StudentNet(self.label_dim, self.path_dim, self.sample_ratio,
                         name="student_net")(x_path, deterministic)
        tea = TeacherNet(self.label_dim, self.path_dim, name="teacher_net")(
            x_path, [omic_t, omic_i], deterministic)
        return stu + tea  # 6-tuple + 8-tuple, reference return order


class MultiScaleNet(nn.Module):
    """Joint two-scale teacher+student training graph
    (reference models/model.py:606-706)."""

    label_dim: int
    input_size_omic_tumor: int
    input_size_omic_immune: int
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    dropout_rate: float = 0.1
    sample_ratio: float = 0.0008
    combination_type: str = "max_confidence"
    stacked_scales: bool = False  # see TeachersNet / parallel/branch_shard.py

    @nn.compact
    def __call__(self, x_path10, x_path20, x_omic_tumor, x_omic_immune,
                 deterministic: bool = True):
        if self.stacked_scales:
            scales = _scale_vmap(TeacherStudentNet, 4)(
                self.label_dim, self.input_size_omic_tumor,
                self.input_size_omic_immune, self.path_dim, self.omic_dim,
                self.dropout_rate, self.sample_ratio, name="scale_nets")
            xs = jnp.stack([x_path10, x_path20])
            outs = scales(xs, x_omic_tumor, x_omic_immune, deterministic)
            (ls10, hs10, ss10, rs10, fs10, as10,
             lt10, ht10, st10, rt10, f1t10, f2t10, a1t10, a2t10) = (
                o[0] for o in outs)
            (ls20, hs20, ss20, rs20, fs20, as20,
             lt20, ht20, st20, rt20, f1t20, f2t20, a1t20, a2t20) = (
                o[1] for o in outs)
            as_stacked = outs[5]  # student maps, scale-leading
        else:
            mk = lambda name: TeacherStudentNet(
                self.label_dim, self.input_size_omic_tumor,
                self.input_size_omic_immune, self.path_dim, self.omic_dim,
                self.dropout_rate, self.sample_ratio, name=name)
            (ls10, hs10, ss10, rs10, fs10, as10,
             lt10, ht10, st10, rt10, f1t10, f2t10, a1t10, a2t10) = mk(
                "scale10_net")(x_path10, x_omic_tumor, x_omic_immune,
                               deterministic)
            (ls20, hs20, ss20, rs20, fs20, as20,
             lt20, ht20, st20, rt20, f1t20, f2t20, a1t20, a2t20) = mk(
                "scale20_net")(x_path20, x_omic_tumor, x_omic_immune,
                               deterministic)
            as_stacked = None

        l_stus = combine_logits(ls10, ls20, self.combination_type)
        h_stus, s_stus, r_stus = survival_chain(l_stus)

        feature_dict = {"feature1_tea10": f1t10, "feature2_tea10": f2t10,
                        "feature1_tea20": f1t20, "feature2_tea20": f2t20,
                        "feature_stu10": fs10, "feature_stu20": fs20}
        att_dict = {"att1_tea10": a1t10, "att2_tea10": a2t10,
                    "att1_tea20": a1t20, "att2_tea20": a2t20,
                    "att_stu10": as10, "att_stu20": as20}
        if as_stacked is not None:
            # scale-leading view for the branch-partitioned consistency loss
            # (train/losses.py path_batch_loss_stacked); eval export skips it
            att_dict["att_stu_stacked"] = as_stacked
        logits_dict = {"logits_tea10": lt10, "logits_tea20": lt20,
                       "logits_stu10": ls10, "logits_stu20": ls20,
                       "logits_stus": l_stus}
        hazards_dict = {"hazards_tea10": ht10, "hazards_tea20": ht20,
                        "hazards_stu10": hs10, "hazards_stu20": hs20,
                        "hazards_stus": h_stus}
        S_dict = {"S_tea10": st10, "S_tea20": st20, "S_stu10": ss10,
                  "S_stu20": ss20, "S_stus": s_stus}
        risk_dict = {"risk_tea10": rt10, "risk_tea20": rt20, "risk_stu10": rs10,
                     "risk_stu20": rs20, "risk_stus": r_stus}
        return feature_dict, att_dict, logits_dict, hazards_dict, S_dict, risk_dict
