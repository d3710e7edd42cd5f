from t2ms_tpu.pipeline.llm import (FakeChat, FakeEmbed, OpenAIChat,
                                   OpenAIEmbed, with_retries)

__all__ = ["FakeChat", "FakeEmbed", "OpenAIChat", "OpenAIEmbed",
           "with_retries"]
