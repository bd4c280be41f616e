from .arpa import read_arpa, write_arpa
from .ngram import BOS, EOS, UNK, NGramLM, train_ngram, uniform_unigram
from .lexicon import Lexicon, PHONE_TO_ID, load_lexicon_file, strip_stress
from .corpus import clean_sentence, clean_text, format_corpus
from .device_ngram import DeviceNGram
from .corpus import convert_numbers_to_words, number_to_words
