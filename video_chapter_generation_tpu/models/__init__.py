"""Model zoo: vision, language, fusion, generation."""

from .bert import BertConfig, BertForChapter, BertModel, convert_hf_bert
from .contrastive import ListwiseBert, MoCoState, MoCoTextEncoder
from .convert_reference import (
    convert_base_chapter_head,
    convert_stacked_window_attention,
    convert_two_stream_window,
    convert_window_chapter_head,
)
from .fusion import (
    ChapterHead,
    CrossAttentionHead,
    SelfAttentionHead,
    StackedWindowAttention,
    TwoStream,
    TwoStreamWindow,
    WindowChapterHead,
)
from .fusion_variants import (
    DomainSpecificChapterHead,
    SingleBlockWindowClassifier,
    TwoStreamDomainSpecific,
)
from .sparse_attention import block_sparse_attention
from .gpt import GPT, GPTConfig, gpt_loss, sample_next
from .resnet import (
    ResNet,
    Resnet50TSM,
    convert_hf_resnet,
    convert_torchvision_resnet50,
)
from .seq2seq import (
    Seq2Seq,
    Seq2SeqConfig,
    Seq2SeqVisionEmb,
    convert_hf_seq2seq,
    generate,
    trim_at_eos,
)

__all__ = [
    "BertConfig", "BertForChapter", "BertModel", "convert_hf_bert",
    "convert_base_chapter_head", "convert_stacked_window_attention",
    "convert_two_stream_window", "convert_window_chapter_head",
    "DomainSpecificChapterHead", "SingleBlockWindowClassifier",
    "TwoStreamDomainSpecific", "block_sparse_attention",
    "ListwiseBert", "MoCoState", "MoCoTextEncoder",
    "ChapterHead", "CrossAttentionHead", "SelfAttentionHead",
    "StackedWindowAttention", "TwoStream", "TwoStreamWindow",
    "WindowChapterHead",
    "GPT", "GPTConfig", "gpt_loss", "sample_next",
    "ResNet", "Resnet50TSM", "convert_hf_resnet",
    "convert_torchvision_resnet50",
    "Seq2Seq", "Seq2SeqConfig", "Seq2SeqVisionEmb", "convert_hf_seq2seq",
    "generate", "trim_at_eos",
]
