# Minimal torchvision stand-in so the reference code at /root/reference can
# be imported as a golden oracle in tests (torchvision is not installed in
# this environment). Only the symbols the reference imports are provided.
