"""Guard the conversation-mode example (examples/conversation_demo.py): the
same homophone-ambiguous posteriors must resolve differently under different
conversation contexts (the reference's personal-use contextual decoding,
language-model-standalone.py:165-199), and the OPT prefix-KV context path
must equal concatenated scoring."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_conversation_demo_end_to_end():
    import conversation_demo

    picks = conversation_demo.main(verbose=False)
    assert picks["look at the sky"] == "the sun is bright here"
    assert picks["he hugged his family"] == "the son is bright here"
