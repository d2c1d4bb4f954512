from chronoedit_tpu.aux.guardrails import (
    Blocklist,
    GuardrailRunner,
    Guardrails,
    text_guardrail,
    video_guardrail,
)

__all__ = ["Blocklist", "GuardrailRunner", "Guardrails", "text_guardrail",
           "video_guardrail"]
