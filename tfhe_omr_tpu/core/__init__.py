"""Protocol layer (L2/L3): parameters, keys, Sender/Detector/Retriever."""
